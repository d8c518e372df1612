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
    variables = model.init(jax.random.PRNGKey(0), inp)
    want = model.apply(variables, inp)

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
    variables = model.init(jax.random.PRNGKey(0), inp)
    want = model.apply(variables, inp)

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
