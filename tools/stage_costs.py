"""Marginal in-jit stage-cost measurement on the real chip.

The axon relay's per-dispatch latency (15-150 ms, non-pipelining) swamps
stage-level timing, so each stage is timed by UNROLLING it N times inside
one jitted program and comparing against the N=1 program: the marginal cost
(t_N - t_1) / (N - 1) cancels both the dispatch latency and the one-time
input transfer.  See NOTES.md (performance accounting).

Usage: python tools/stage_costs.py [--batch 32] [--n 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from loftr_tpu.config import get_config
    from loftr_tpu.models.backbone import build_backbone
    from loftr_tpu.models.position_encoding import add_position_encoding
    from loftr_tpu.models.transformer import LocalFeatureTransformer
    from loftr_tpu.ops import matching as M
    import flax.linen as nn

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cfg = get_config("indoor_ds", {"loftr": {"dtype": args.dtype}}).loftr
    dt = jnp.dtype(cfg.dtype) if cfg.dtype != "float32" else None
    B, H, W = args.batch, 480, 640
    hw_c = (H // 8, W // 8)
    L = hw_c[0] * hw_c[1]
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2 * B, H, W, 1), jnp.float32)

    bb = build_backbone(cfg.backbone.resolution, cfg.backbone.initial_dim,
                        cfg.backbone.block_dims, cfg.backbone.norm,
                        name="backbone", dtype=dt)
    bb_vars = jax.jit(bb.init)(jax.random.PRNGKey(0), imgs[:2])

    tf_c = LocalFeatureTransformer(cfg.coarse.d_model, cfg.coarse.nhead,
                                   cfg.coarse.layer_names,
                                   cfg.coarse.attention, dt)
    fc = jnp.asarray(rng.rand(B, L, cfg.coarse.d_model), jnp.float32)
    tf_vars = jax.jit(tf_c.init)(jax.random.PRNGKey(1), fc, fc, None, None)

    tf_f = LocalFeatureTransformer(cfg.fine.d_model, cfg.fine.nhead,
                                   cfg.fine.layer_names, cfg.fine.attention,
                                   dt)
    K = cfg.match_coarse.max_matches
    Wf = cfg.fine.window_size
    wf = jnp.asarray(rng.rand(B * K, Wf * Wf, cfg.fine.d_model), jnp.float32)
    tff_vars = jax.jit(tf_f.init)(jax.random.PRNGKey(2), wf, wf, None, None)

    def timed(fn, *xs):
        """Return seconds for one dispatch (hard sync by device fetch)."""
        out = fn(*xs)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # warmup
        t0 = time.perf_counter()
        out = fn(*xs)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return time.perf_counter() - t0

    N = args.n

    def stage(name, one, many):
        t1 = timed(one)
        tn = timed(many)
        per = (tn - t1) / (N - 1)
        print(f"{name:24s}: marginal {per * 1e3 / B:7.3f} ms/pair  "
              f"(t1={t1 * 1e3:.0f}ms tN={tn * 1e3:.0f}ms)")
        return per

    # backbone (2B images per pair-batch)
    @jax.jit
    def bb1(v, x):
        c, f = bb.apply(v, x)
        return jnp.sum(c) + jnp.sum(f)

    @jax.jit
    def bbN(v, x):
        acc = jnp.zeros(())
        for k in range(N):
            c, f = bb.apply(v, x + k * 1e-6)
            acc += jnp.sum(c) + jnp.sum(f)
        return acc

    t_bb = stage("backbone", lambda: bb1(bb_vars, imgs),
                 lambda: bbN(bb_vars, imgs))

    # coarse transformer
    @jax.jit
    def tf1(v, a, b):
        x, y = tf_c.apply(v, a, b, None, None)
        return jnp.sum(x) + jnp.sum(y)

    @jax.jit
    def tfN(v, a, b):
        acc = jnp.zeros(())
        for k in range(N):
            x, y = tf_c.apply(v, a + k * 1e-6, b, None, None)
            acc += jnp.sum(x) + jnp.sum(y)
        return acc

    t_tf = stage("coarse transformer", lambda: tf1(tf_vars, fc, fc),
                 lambda: tfN(tf_vars, fc, fc))

    # fused coarse matching (pallas dual-softmax)
    @jax.jit
    def cm1(a, b):
        cand = M.pallas_mutual_nearest_candidates(
            a, b, 0.1, 0.2, 2, hw_c, hw_c, None, None)
        return jnp.sum(cand.mconf)

    @jax.jit
    def cmN(a, b):
        acc = jnp.zeros(())
        for k in range(N):
            cand = M.pallas_mutual_nearest_candidates(
                a + k * 1e-6, b, 0.1, 0.2, 2, hw_c, hw_c, None, None)
            acc += jnp.sum(cand.mconf)
        return acc

    t_cm = stage("coarse match (pallas)", lambda: cm1(fc, fc),
                 lambda: cmN(fc, fc))

    # fine transformer at full K capacity
    @jax.jit
    def ff1(v, a, b):
        x, y = tf_f.apply(v, a, b, None, None)
        return jnp.sum(x) + jnp.sum(y)

    @jax.jit
    def ffN(v, a, b):
        acc = jnp.zeros(())
        for k in range(N):
            x, y = tf_f.apply(v, a + k * 1e-6, b, None, None)
            acc += jnp.sum(x) + jnp.sum(y)
        return acc

    t_ff = stage("fine transformer", lambda: ff1(tff_vars, wf, wf),
                 lambda: ffN(tff_vars, wf, wf))

    total = t_bb + t_tf + t_cm + t_ff
    print(f"{'sum of stages':24s}: marginal {total * 1e3 / B:7.3f} ms/pair")


if __name__ == "__main__":
    main()
