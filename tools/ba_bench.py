#!/usr/bin/env python
"""Bundle-adjustment iteration throughput on a synthetic scene.

Fills the BASELINE.md gap "BA iters/s for the new backend": times
ba_iteration (Schur-complement LM step) for the dense and matrix-free-PCG
solvers at two problem scales, on whatever backend is active (TPU chip via
the relay, or CPU with JAX_PLATFORMS=cpu).

Usage:  python tools/ba_bench.py [--iters 10]
Writes perf/ba_bench.json and prints one JSON line per config.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_problem(C, P, O, rng):
    """Cameras on an arc observing a cloud (tests/test_sfm_ba.py recipe)."""
    import numpy as np
    import jax.numpy as jnp
    from loftr_tpu.sfm.lie import exp_so3
    from loftr_tpu.sfm.bundle_adjustment import BAProblem

    pts = rng.rand(P, 3) * [4, 3, 2] + [-2, -1.5, 6]
    R_gt = np.zeros((C, 3, 3))
    t_gt = np.zeros((C, 3))
    for c in range(C):
        angle = (c - C / 2) * 0.04
        Rc = np.asarray(exp_so3(jnp.asarray(
            np.array([0.0, angle, 0.0])[None])))[0]
        center = np.array([c * 0.2 - C * 0.1, 0.1 * rng.randn(), 0.0])
        R_gt[c] = Rc
        t_gt[c] = -Rc @ center

    obs_cam = np.zeros((P, O), np.int32)
    obs_uv = np.zeros((P, O, 2), np.float32)
    obs_w = np.ones((P, O), np.float32)
    for p in range(P):
        cams = rng.choice(C, O, replace=False)
        obs_cam[p] = cams
        for o, c in enumerate(cams):
            Xc = R_gt[c] @ pts[p] + t_gt[c]
            obs_uv[p, o] = Xc[:2] / Xc[2] + rng.randn(2) * 1e-3

    fix = np.zeros(C, bool)
    fix[0] = True
    return BAProblem(
        R=jnp.asarray(R_gt, jnp.float32),
        t=jnp.asarray(t_gt + rng.randn(C, 3) * 0.01, jnp.float32),
        points=jnp.asarray(pts + rng.randn(P, 3) * 0.01, jnp.float32),
        obs_uv=jnp.asarray(obs_uv), obs_cam=jnp.asarray(obs_cam),
        obs_w=jnp.asarray(obs_w), fix_mask=jnp.asarray(fix))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "perf", "ba_bench.json"))
    args = ap.parse_args()

    from loftr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import numpy as np
    import jax
    from loftr_tpu.sfm.bundle_adjustment import ba_iteration

    rng = np.random.RandomState(0)
    results = []
    for (C, P, O, solver) in [(12, 500, 4, "dense"),
                              (60, 4000, 4, "dense"),
                              (60, 4000, 4, "pcg")]:
        prob = synth_problem(C, P, O, rng)
        lam = jax.numpy.asarray(1e-3, jax.numpy.float32)
        out = ba_iteration(prob, lam, solver=solver)  # compile + warmup
        float(np.asarray(out[2]))
        t_done = []
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = ba_iteration(prob, lam, solver=solver)
            float(np.asarray(out[2]))  # host fetch = hard sync
            t_done.append(time.perf_counter())
        dt = float(np.median(np.diff([t0] + t_done)))
        rec = {"metric": "ba_iters_per_s", "solver": solver,
               "cams": C, "points": P, "obs": P * O,
               "iter_ms": round(dt * 1e3, 2),
               "iters_per_s": round(1.0 / dt, 2),
               "backend": jax.default_backend()}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"results": results}, f, indent=1)


if __name__ == "__main__":
    main()
