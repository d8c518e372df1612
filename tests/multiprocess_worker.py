"""Worker for the true multi-process (multi-host analogue) test.

Spawned by tests/test_multiprocess.py as N independent OS processes, each a
separate JAX controller (the multi-host topology of SURVEY.md §2.6 /
reference /root/reference/train.py:106-108 multi-node DDP, on local CPU).
Exercises, cross-process:

  1. jax.distributed.initialize + a global ('data',) mesh spanning processes
  2. scene sharding (data/sharding.py::get_local_split) disjointness
  3. one REAL data-parallel train step (train/trainer.py) on a global batch
     assembled with make_array_from_process_local_data, checked numerically
     against a single-controller run of the same global batch (sync-BN /
     GSPMD gradient equivalence across process boundaries)
  4. the evaluator's pickled-object metric merge
     (parallel/comm.py::process_allgather_objects)

Writes "<out>/ok_<rank>.json" on success; the pytest asserts on them.
"""
import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    world = int(sys.argv[2])
    port = sys.argv[3]
    out_dir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=world, process_id=rank)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from loftr_tpu import MatchInput, get_config
    from loftr_tpu.data.sharding import get_local_split
    from loftr_tpu.parallel.comm import process_allgather_objects
    from loftr_tpu.train.trainer import Trainer

    assert jax.process_count() == world
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == world * n_local

    # --- [2] scene sharding: disjoint cover across processes ------------
    scenes = [f"scene{i:04d}" for i in range(11)]
    mine = get_local_split(scenes, world, rank, seed=66)
    shards = process_allgather_objects(list(mine))
    flat = [s for shard in shards for s in shard]
    assert len(set(flat)) == len(scenes), "scene shards must cover all"

    # --- [3] one real data-parallel train step across processes ---------
    cfg = get_config("indoor_ds").replaced({
        "loftr": {
            "backbone": {"initial_dim": 8, "block_dims": (8, 12, 16)},
            "coarse": {"d_model": 16, "nhead": 2,
                       "layer_names": ("self", "cross")},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ("self", "cross")},
            "match_coarse": {"train_matches": 8, "train_pad_num_gt_min": 2,
                             "max_matches": 8},
        },
        "trainer": {"scheduler_interval": "step", "warmup_step": 10},
    })

    B_global = n_global
    H = W = 64
    rng = np.random.RandomState(0)  # same on every process
    K = np.array([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]] * B_global,
                 np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (B_global, 1, 1))
    full = MatchInput(
        image0=jnp.asarray(rng.rand(B_global, H, W, 1), jnp.float32),
        image1=jnp.asarray(rng.rand(B_global, H, W, 1), jnp.float32),
        depth0=jnp.asarray(rng.rand(B_global, H, W) * 2 + 1, jnp.float32),
        depth1=jnp.asarray(rng.rand(B_global, H, W) * 2 + 1, jnp.float32),
        T_0to1=jnp.asarray(T), T_1to0=jnp.asarray(T),
        K0=jnp.asarray(K), K1=jnp.asarray(K))

    trainer = Trainer(cfg, world_size=n_global, batch_size_per_device=1)
    example = jax.tree.map(lambda x: np.asarray(x)[:1], full)

    # single-controller reference on the SAME global batch (local devices
    # only; every process computes it independently and identically)
    ref_state = trainer.init_state(jax.random.PRNGKey(0), example)
    _, ref_scalars = trainer.train_step(ref_state, full)
    ref_loss = float(ref_scalars["loss"])

    # multi-controller run: global mesh over all processes' devices
    mesh = Mesh(np.array(jax.devices()).reshape(-1, 1), ("data", "model"))
    repl = NamedSharding(mesh, P())
    with jax.set_mesh(mesh):
        state = jax.jit(
            lambda: trainer.init_state(jax.random.PRNGKey(0), example),
            out_shardings=repl)()

        lo = rank * n_local  # this process's slice of the global batch
        def to_global(x):
            if x is None:
                return None
            local = np.asarray(x)[lo: lo + n_local]
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data")), local, x.shape)
        gbatch = jax.tree.map(to_global, full,
                              is_leaf=lambda x: x is None)
        state, scalars = trainer.train_step(state, gbatch)
        loss = float(jax.device_get(
            jax.jit(lambda s: s, out_shardings=repl)(scalars["loss"])))

    assert np.isfinite(loss), loss
    assert abs(loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss)), \
        (loss, ref_loss)

    # --- [4] evaluator-style ragged/string metric merge -----------------
    metrics = {"identifiers": [f"scene{rank}#p{i}" for i in range(rank + 1)],
               "epi_errs": [np.arange(rank + 2, dtype=np.float32)],
               "R_errs": [0.5 * rank]}
    merged_lists = process_allgather_objects(metrics)
    idents = [i for m in merged_lists for i in m["identifiers"]]
    assert len(idents) == world * (world + 1) // 2
    assert len(set(idents)) == len(idents)

    with open(os.path.join(out_dir, f"ok_{rank}.json"), "w") as f:
        json.dump({"rank": rank, "world": world, "loss": loss,
                   "ref_loss": ref_loss, "n_global_devices": n_global,
                   "scenes": list(mine)}, f)


if __name__ == "__main__":
    main()
