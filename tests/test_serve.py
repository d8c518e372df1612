"""Serving subsystem tests: bucket selection, preprocessing geometry,
micro-batching correctness (results match direct model calls), flush/rung
behavior, error propagation, and stats accounting.

The reference has no serving layer (closest surface:
/root/reference/demo/demo_loftr.py single-stream demo) — this is new scope.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu import LoFTR, MatchInput, get_config
from loftr_tpu.serve import (MatchingService, pick_bucket,
                             preprocess_to_bucket)


SMALL = {
    "loftr": {
        "dtype": "float32",
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2,
                 "layer_names": ("self", "cross"), "window_size": 5},
        "match_coarse": {"max_matches": 16, "use_pallas": False},
    }
}


def _service(**kw):
    cfg = get_config("default", SMALL)
    model = LoFTR(cfg.loftr)
    inp = MatchInput(
        image0=jnp.zeros((1, 64, 64, 1), jnp.float32),
        image1=jnp.zeros((1, 64, 64, 1), jnp.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    defaults = dict(preset="default", dtype="float32", use_pallas=False,
                    overrides=SMALL, buckets=((64, 64), (96, 96)),
                    batch_sizes=(1, 2, 4), flush_ms=20.0)
    defaults.update(kw)
    return MatchingService(variables, **defaults), variables, model


def test_pick_bucket():
    buckets = ((64, 64), (96, 128))
    assert pick_bucket(buckets, [(60, 60), (64, 64)]) == (64, 64)
    assert pick_bucket(buckets, [(60, 100)]) == (96, 128)
    # nothing fits -> largest (downscale)
    assert pick_bucket(buckets, [(500, 500)]) == (96, 128)


def test_preprocess_to_bucket_geometry():
    img = np.random.RandomState(0).rand(48, 56).astype(np.float32)
    padded, mask, scale = preprocess_to_bucket(img, (64, 64))
    assert padded.shape == (64, 64)
    assert mask.shape == (8, 8)
    # native fit: no resize, scale 1, mask covers ceil-free region
    np.testing.assert_allclose(scale, [1.0, 1.0])
    assert mask[:48 // 8, :56 // 8].all()
    assert not mask[48 // 8:, :].any() and not mask[:, 56 // 8:].any()
    # content preserved in the top-left corner
    np.testing.assert_allclose(padded[:48, :56], img)
    assert (padded[48:, :] == 0).all()

    # downscale path: large image lands inside the bucket with scale > 1
    big = np.random.RandomState(1).rand(128, 160).astype(np.float32)
    padded, mask, scale = preprocess_to_bucket(big, (64, 64))
    assert padded.shape == (64, 64)
    assert (scale >= 1.0).all()


def test_service_matches_direct_call():
    # float32 wire: the batching path must be EXACT vs a direct call
    svc, variables, model = _service(wire_dtype="float32")
    rng = np.random.RandomState(3)
    img0 = rng.rand(64, 64).astype(np.float32)
    img1 = rng.rand(64, 64).astype(np.float32)
    with svc:
        res = svc.match(img0, img1)
    # direct single-pair forward on the same padded inputs
    inp = MatchInput(
        image0=jnp.asarray(img0)[None, :, :, None],
        image1=jnp.asarray(img1)[None, :, :, None],
        mask0=jnp.ones((1, 8, 8), bool), mask1=jnp.ones((1, 8, 8), bool),
        scale0=jnp.ones((1, 2)), scale1=jnp.ones((1, 2)))
    out = jax.jit(model.apply)(variables, inp)
    valid = np.asarray(out.valid)[0]
    np.testing.assert_allclose(
        res["mkpts0"], np.asarray(out.mkpts0_f)[0][valid], atol=1e-4)
    np.testing.assert_allclose(
        res["mkpts1"], np.asarray(out.mkpts1_f)[0][valid], atol=1e-4)
    assert res["mconf"].shape == res["mkpts0"].shape[:1]


def test_service_uint8_wire_matches_direct_call():
    # default uint8 wire: for uint8 inputs (the camera case) the on-device
    # /255 normalization must reproduce the direct float call exactly
    svc, variables, model = _service()  # wire_dtype defaults to uint8
    rng = np.random.RandomState(4)
    img0 = rng.randint(0, 255, (64, 64), dtype=np.uint8)
    img1 = rng.randint(0, 255, (64, 64), dtype=np.uint8)
    with svc:
        res = svc.match(img0, img1)
    inp = MatchInput(
        image0=jnp.asarray(img0, jnp.float32)[None, :, :, None] / 255.0,
        image1=jnp.asarray(img1, jnp.float32)[None, :, :, None] / 255.0,
        mask0=jnp.ones((1, 8, 8), bool), mask1=jnp.ones((1, 8, 8), bool),
        scale0=jnp.ones((1, 2)), scale1=jnp.ones((1, 2)))
    out = jax.jit(model.apply)(variables, inp)
    valid = np.asarray(out.valid)[0]
    np.testing.assert_allclose(
        res["mkpts0"], np.asarray(out.mkpts0_f)[0][valid], atol=1e-4)
    np.testing.assert_allclose(
        res["mkpts1"], np.asarray(out.mkpts1_f)[0][valid], atol=1e-4)


def test_service_batches_and_pads():
    svc, _, _ = _service(flush_ms=50.0)
    rng = np.random.RandomState(5)
    imgs = [(rng.rand(64, 64).astype(np.float32),
             rng.rand(64, 64).astype(np.float32)) for _ in range(3)]
    with svc:
        futs = [svc.submit(a, b) for a, b in imgs]
        results = [f.result(timeout=120) for f in futs]
    for r in results:
        assert r["mkpts0"].shape == r["mkpts1"].shape
        assert r["mkpts0"].ndim == 2 and r["mkpts0"].shape[1] == 2
    snap = svc.stats.snapshot()
    assert snap["requests"] == 3
    # 3 requests in <= 3 batches; if any grouped to the 4-rung, padding shows
    assert 1 <= snap["batches"] <= 3
    assert snap["latency_ms_p50"] is not None


def test_service_mixed_buckets_and_min_conf():
    svc, _, _ = _service()
    rng = np.random.RandomState(7)
    small = rng.rand(60, 60).astype(np.float32)
    large = rng.rand(90, 90).astype(np.float32)
    with svc:
        f_small = svc.submit(small, small)
        f_large = svc.submit(large, large)
        f_conf = svc.submit(small, small, min_conf=2.0)  # > any conf
        r_small, r_large = f_small.result(120), f_large.result(120)
        r_conf = f_conf.result(120)
    assert r_small["mkpts0"].dtype == np.float32
    assert r_large["mkpts0"].shape[1] == 2
    assert r_conf["mkpts0"].shape[0] == 0  # min_conf filters everything


def test_service_rejects_after_close():
    svc, _, _ = _service()
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros((64, 64), np.float32),
                   np.zeros((64, 64), np.float32))


@pytest.mark.heavy
def test_service_multi_device_mesh():
    """Data-parallel serving: rows sharded over a 4-device 'data' axis give
    the same matches as the unsharded service; rungs round to multiples."""
    from loftr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    # float32 wire: this test checks mesh sharding against an exact-float
    # oracle; the default uint8 wire would add 1/255 quantization (~0.01 px
    # fine-coordinate shift, covered by the uint8-wire test instead)
    svc, variables, model = _service(mesh=mesh, batch_sizes=(1, 2, 4),
                                     flush_ms=40.0, wire_dtype="float32")
    # rungs rounded up to multiples of 4 and deduped
    assert svc.batch_sizes == (4,)
    rng = np.random.RandomState(11)
    imgs = [(rng.rand(64, 64).astype(np.float32),
             rng.rand(64, 64).astype(np.float32)) for _ in range(6)]
    with svc:
        futs = [svc.submit(a, b) for a, b in imgs]
        meshed = [f.result(timeout=120) for f in futs]
    # oracle: direct single-pair forwards on one device
    for (a, b), r in zip(imgs, meshed):
        inp = MatchInput(
            image0=jnp.asarray(a)[None, :, :, None],
            image1=jnp.asarray(b)[None, :, :, None],
            mask0=jnp.ones((1, 8, 8), bool), mask1=jnp.ones((1, 8, 8), bool),
            scale0=jnp.ones((1, 2)), scale1=jnp.ones((1, 2)))
        out = model.apply(variables, inp)
        valid = np.asarray(out.valid)[0]
        np.testing.assert_allclose(
            r["mkpts0"], np.asarray(out.mkpts0_f)[0][valid], atol=1e-3)
        np.testing.assert_allclose(
            r["mkpts1"], np.asarray(out.mkpts1_f)[0][valid], atol=1e-3)
    # 6 requests -> two rung-4 batches with 2 padded rows total
    snap = svc.stats.snapshot()
    assert snap["requests"] == 6 and snap["batches"] == 2
    assert snap["padded_rows"] == 2


def test_inline_and_pipelined_stacking_agree():
    """stack_workers=0 (inline batcher) and the default pipelined stacking
    produce identical results; pipelined mode records phase timings."""
    rng = np.random.RandomState(21)
    pairs = [(rng.rand(64, 64).astype(np.float32),
              rng.rand(64, 64).astype(np.float32)) for _ in range(5)]
    results = {}
    for workers in (0, 2):
        svc, _, _ = _service(stack_workers=workers, wire_dtype="float32")
        with svc:
            futs = [svc.submit(a, b) for a, b in pairs]
            results[workers] = [f.result(timeout=120) for f in futs]
        snap = svc.stats.snapshot()
        assert snap["requests"] == 5
        if workers:
            assert "stack" in snap["phase_ms_mean"]
            assert "dispatch" in snap["phase_ms_mean"]
            assert "fetch" in snap["phase_ms_mean"]
    for r0, r2 in zip(results[0], results[2]):
        np.testing.assert_allclose(r0["mkpts0"], r2["mkpts0"], atol=1e-5)
        np.testing.assert_allclose(r0["mkpts1"], r2["mkpts1"], atol=1e-5)


def test_saturated_pipeline_holds_partial_rungs():
    """When the dispatch pipeline is saturated (busy >= queue_depth), the
    age-based flush must hold partial groups for full rungs instead of
    padding them out — regression for the measured c=32 throughput drop
    (27.9 -> 16.4 pairs/s) where pipelined stacking raced ahead of
    arrivals and dispatched rungs of 3-6 real rows.  A slowed _apply
    saturates the pipeline while requests trickle in."""
    import time

    svc, _, _ = _service(stack_workers=2, wire_dtype="float32",
                         flush_ms=5.0, batch_sizes=(1, 2, 4))
    orig_apply = svc._apply

    def slow_apply(v, i):
        time.sleep(0.15)
        return orig_apply(v, i)

    svc._apply = slow_apply
    rng = np.random.RandomState(7)
    pairs = [(rng.rand(64, 64).astype(np.float32),
              rng.rand(64, 64).astype(np.float32)) for _ in range(16)]
    with svc:
        futs = []
        for a, b in pairs:
            futs.append(svc.submit(a, b))
            time.sleep(0.003)  # trickle slower than the 5 ms flush window
        for f in futs:
            f.result(timeout=300)
    snap = svc.stats.snapshot()
    assert snap["requests"] == 16
    # ungated, the 5 ms flush would cut ~10+ partial batches out of this
    # trickle; the gate allows at most queue_depth(2) early partials plus
    # full rungs (and a final drain partial on close)
    assert snap["batches"] <= 9, snap
    assert snap["batch_hist"].get(4, 0) >= 2, snap


def test_cancelled_future_does_not_kill_completer():
    """A client cancel() on a pending future must not kill the worker
    thread that resolves its batch (set_result on a cancelled Future
    raises InvalidStateError) nor leak the busy counter that gates
    partial-rung flushes — later requests must still complete."""
    import time

    svc, _, _ = _service(stack_workers=2, wire_dtype="float32",
                         flush_ms=5.0)
    orig_apply = svc._apply

    def slow_apply(v, i):
        time.sleep(0.2)
        return orig_apply(v, i)

    svc._apply = slow_apply
    rng = np.random.RandomState(11)
    img = rng.rand(64, 64).astype(np.float32)
    with svc:
        doomed = svc.submit(img, img)
        assert doomed.cancel()  # pending: never marked running
        # the batch containing the cancelled future resolves fine...
        ok = [svc.submit(img, img) for _ in range(3)]
        for f in ok:
            r = f.result(timeout=120)
            assert r["mkpts0"].ndim == 2
        # ...and the busy counter drained (no leaked increments), so a
        # fresh partial rung still flushes promptly
        with svc._lock:
            assert svc._busy == 0, svc._busy


def test_starved_bucket_flushes_within_max_hold():
    """The saturation gate must NOT starve a partial rung in a bucket
    that cannot fill: while one bucket's full rungs keep the pipeline
    busy, a lone request in the other bucket flushes after max_hold_ms
    and completes long before the flood drains."""
    import time

    import threading

    svc, _, _ = _service(stack_workers=2, wire_dtype="float32",
                         flush_ms=5.0, batch_sizes=(1, 2, 4),
                         max_hold_ms=50.0)
    svc.warmup()              # pre-compile: measure scheduling, not XLA
    orig_apply = svc._apply

    def slow_apply(v, i):
        time.sleep(0.25)
        return orig_apply(v, i)

    svc._apply = slow_apply
    rng = np.random.RandomState(13)
    a = rng.rand(64, 64).astype(np.float32)    # 64x64 bucket
    b = rng.rand(96, 96).astype(np.float32)    # 96x96 bucket
    flood = []

    def feeder():
        # one full 4-rung every 300 ms for ~3 s: full rungs keep arriving
        # AFTER the lone request, so without the over-held priority the
        # newer rungs would outrank the partial until the stream ends
        for _ in range(10):
            flood.extend(svc.submit(a, a) for _ in range(4))
            time.sleep(0.3)

    with svc:
        th = threading.Thread(target=feeder)
        th.start()
        time.sleep(0.15)      # a couple of rungs in flight -> saturated
        t0 = time.perf_counter()
        lone = svc.submit(b, b)
        lone.result(timeout=120)
        lone_latency = time.perf_counter() - t0
        th.join()
        for f in flood:
            f.result(timeout=120)
    # the stream lasts ~3 s; the lone request must dispatch at ~max_hold
    # (50 ms) + a few in-flight batches, not after the stream drains
    assert lone_latency < 2.0, lone_latency


def test_to_gray_value_ranges():
    """_to_gray must preserve the value range for every (input dtype x wire)
    combination — regression for uint8 COLOR inputs, whose BGR matmul
    promotes to float32 in [0, 255] and used to saturate the uint8 wire
    (clip to all-255) and reach the model unnormalized on the float wire."""
    from loftr_tpu.serve.service import _to_gray

    rng = np.random.RandomState(9)
    f_rgb = rng.rand(16, 16, 3).astype(np.float32)          # [0, 1] float
    u_rgb = np.round(f_rgb * 255.0).astype(np.uint8)         # same image u8
    u_gray = (rng.rand(16, 16) * 255).astype(np.uint8)

    # float32 wire: both color dtypes land in [0, 1] and agree (~1/255).
    gf = _to_gray(f_rgb, np.float32)
    gu = _to_gray(u_rgb, np.float32)
    assert gf.dtype == np.float32 and 0.0 <= gu.min() and gu.max() <= 1.0
    np.testing.assert_allclose(gu, gf, atol=2.5 / 255.0)
    # uint8 wire: uint8 color must NOT saturate; matches float-color wire.
    wu = _to_gray(u_rgb, np.uint8)
    wf = _to_gray(f_rgb, np.uint8)
    assert wu.dtype == np.uint8
    assert int(np.sum(wu == 255)) < wu.size // 10
    assert np.abs(wu.astype(int) - wf.astype(int)).max() <= 2
    # uint8 grayscale passes through untouched on the uint8 wire.
    np.testing.assert_array_equal(_to_gray(u_gray, np.uint8), u_gray)


def test_service_uint8_and_rgb_inputs():
    """Color (uint8 RGB) and grayscale submissions of the SAME underlying
    image must produce identical matches — end-to-end range-handling check."""
    svc, _, _ = _service()
    rng = np.random.RandomState(9)
    u8 = (rng.rand(64, 64) * 255).astype(np.uint8)
    rgb = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    gray_of_rgb = np.clip(np.round(
        rgb @ np.asarray([0.114, 0.587, 0.299], np.float32)), 0, 255
    ).astype(np.uint8)
    with svc:
        r = svc.match(u8, rgb)
        r_gray = svc.match(u8, gray_of_rgb)
    assert r["mkpts0"].shape[1] == 2
    # On the uint8 wire the color path quantizes identically to its own
    # grayscale rendering -> bit-identical device inputs and matches.
    assert r["mkpts0"].shape == r_gray["mkpts0"].shape
    np.testing.assert_allclose(r["mkpts1"], r_gray["mkpts1"], atol=1e-5)
