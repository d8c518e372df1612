"""Coverage for auxiliary subsystems: checkpoint retention, schedules,
config merging, profiler, logging, full-attention variant, CE loss."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_checkpoint_topk_retention(tmp_path):
    from loftr_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path), save_top_k=2, monitor="auc@10")
    state = {"w": jnp.ones((3,))}
    for step, auc in [(1, 0.1), (2, 0.5), (3, 0.3), (4, 0.7)]:
        mgr.save(step, {"w": jnp.ones((3,)) * step}, {"auc@10": auc})
    # best 2 by auc: steps 2 (0.5) and 4 (0.7)
    kept = sorted(int(p) for p in os.listdir(tmp_path) if p.isdigit())
    assert kept == [2, 4], kept
    restored = mgr.restore(state, step=4)
    np.testing.assert_allclose(np.asarray(restored["w"]), 4.0)
    mgr.close()


def test_lr_schedule_warmup_and_milestones():
    from loftr_tpu.config import TrainerConfig
    from loftr_tpu.train.optim import lr_schedule
    cfg = TrainerConfig(warmup_type="linear", warmup_ratio=0.0,
                        scheduler="MultiStepLR", scheduler_interval="step",
                        mslr_milestones=(100, 200), mslr_gamma=0.5)
    sched = lr_schedule(cfg, true_lr=1e-3, warmup_step=10)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(150)) == pytest.approx(5e-4)   # after milestone 100
    assert float(sched(250)) == pytest.approx(2.5e-4)  # after milestone 200
    # constant warmup
    cfg2 = TrainerConfig(warmup_type="constant", warmup_ratio=0.1,
                         scheduler="MultiStepLR", scheduler_interval="step")
    s2 = lr_schedule(cfg2, 1e-3, 10)
    assert float(s2(5)) == pytest.approx(1e-4)


def test_config_merge_and_errors():
    from loftr_tpu.config import get_config
    cfg = get_config("outdoor_ds")
    assert cfg.trainer.canonical_lr == 8e-3
    assert cfg.loftr.match_coarse.train_coarse_percent == 0.3
    cfg2 = cfg.replaced({"loftr": {"match_coarse": {"thr": 0.5}}})
    assert cfg2.loftr.match_coarse.thr == 0.5
    assert cfg.loftr.match_coarse.thr == 0.2  # original untouched
    with pytest.raises(KeyError, match="no config field"):
        cfg.replaced({"loftr": {"nonexistent": 1}})
    # LR scaling rule (train.py:70-77)
    lr, warm = cfg.scaled_lr(world_size=8, batch_size_per_device=4)
    assert lr == pytest.approx(8e-3 * 32 / 64)
    assert warm == int(4800 / 0.5)


def test_region_profiler_summary():
    from loftr_tpu.utils.profiler import RegionProfiler, build_profiler
    prof = build_profiler("inference")
    with prof.profile("stage_a"):
        _ = jnp.sum(jnp.ones((100, 100)) @ jnp.ones((100, 100)))
    with prof.profile("stage_a"):
        pass
    with prof.profile("stage_b"):
        pass
    summary = prof.summary()
    assert "stage_a" in summary and "stage_b" in summary
    assert len(prof.times["stage_a"]) == 2
    with pytest.raises(ValueError):
        build_profiler("bogus")


def test_metrics_logger(tmp_path):
    from loftr_tpu.utils.logging import MetricsLogger
    lg = MetricsLogger(log_dir=str(tmp_path), echo=False)
    lg.log(1, {"loss": 0.5}, epoch=0)
    lg.log(2, {"loss": jnp.asarray(0.25)}, epoch=0)
    lg.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 0.25


def test_full_attention_model_variant():
    from loftr_tpu import LoFTR, MatchInput, get_config
    cfg = get_config("default").replaced({"loftr": {
        "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
        "coarse": {"d_model": 16, "nhead": 2,
                   "layer_names": ("self", "cross"), "attention": "full"},
        "fine": {"d_model": 8, "nhead": 2, "layer_names": ("self", "cross"),
                 "attention": "full"},
        "match_coarse": {"max_matches": 8}}})
    model = LoFTR(cfg.loftr)
    rng = np.random.RandomState(0)
    inp = MatchInput(image0=jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32),
                     image1=jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    out = jax.jit(model.apply)(v, inp)
    assert np.isfinite(np.asarray(out.mkpts1_f)).all()


def test_cross_entropy_coarse_loss():
    from loftr_tpu.config import LossConfig, MatchCoarseConfig
    from loftr_tpu.losses import coarse_loss
    conf = jnp.asarray([[[0.9, 0.1], [0.2, 0.8]]])
    gt = jnp.asarray([[[True, False], [False, True]]])
    cfg = LossConfig(coarse_type="cross_entropy")
    mc = MatchCoarseConfig(sparse_spvs=False)
    got = float(coarse_loss(conf, gt, cfg, mc))
    lp = np.mean([-np.log(0.9), -np.log(0.8)])
    ln = np.mean([-np.log(0.9), -np.log(0.8)])
    assert got == pytest.approx(lp + ln, rel=1e-5)


def test_group_norm_backbone():
    from loftr_tpu.models.backbone import ResNetFPN_8_2
    m = ResNetFPN_8_2(8, (8, 16, 32), norm="group")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 1), jnp.float32)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    assert "batch_stats" not in v  # group norm keeps no running stats
    c, f = jax.jit(m.apply)(v, x)
    assert np.isfinite(np.asarray(c)).all()


def test_sinkhorn_sparse_spvs_loss_path():
    """OT + sparse supervision uses the dustbin negatives branch."""
    from loftr_tpu.config import LossConfig, MatchCoarseConfig
    from loftr_tpu.losses import coarse_loss
    rng = np.random.RandomState(0)
    L = S = 4
    conf_with_bin = jnp.asarray(
        jax.nn.softmax(jnp.asarray(rng.rand(1, L + 1, S + 1)), axis=-1))
    gt = np.zeros((1, L, S), bool)
    gt[0, 0, 1] = True
    loss = float(coarse_loss(conf_with_bin[:, :L, :S], jnp.asarray(gt),
                             LossConfig(),
                             MatchCoarseConfig(match_type="sinkhorn",
                                               sparse_spvs=True),
                             conf_with_bin=conf_with_bin))
    assert np.isfinite(loss) and loss > 0


def test_demo_cli_smoke(tmp_path):
    """demo/demo_loftr.py end-to-end on the reference sample images
    (previously manual-only): dir source -> matcher -> figure PNGs."""
    import os
    import subprocess
    import sys
    samples = "/root/reference/assets/scannet_sample_images"
    if not os.path.isdir(samples):
        pytest.skip("sample images missing")
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "demo",
                      "demo_loftr.py"),
         "--input", samples, "--output", str(tmp_path / "out"),
         "--resize", "96", "72", "--max-frames", "2",
         "--dtype", "float32"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    pngs = list((tmp_path / "out").glob("*.png"))
    assert pngs, out.stdout
