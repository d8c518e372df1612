#!/usr/bin/env python
"""Ring full-attention perf artifact (round-5 verdict ask #7).

Measures what SURVEY.md §5.7 sells as the large-image capability:

1. fake-mesh (8 virtual CPU devices): ring_full_attention vs the
   replicated single-device oracle — wall time (correctness-grade only on
   shared CPU cores; labeled as such), plus the EXCHANGE VOLUME extracted
   from the compiled HLO's collective-permute instructions and the
   analytic per-device score-block memory that bounds capacity;
2. single chip: the largest token count L whose full [B, L, H, S] softmax
   attention still compiles + runs, found by doubling search — the point
   past which the ring is the ONLY way to run full attention — with
   measured ms at each feasible L.

The ring replaces the reference's FullAttention fallback
(/root/reference/src/loftr/loftr_module/linear_attention.py:50-81), whose
single-GPU score matrix hits the same quadratic wall.

Usage:
  CPU phase:  JAX_PLATFORMS=cpu python tools/ring_bench.py --phase mesh
  chip phase: python tools/ring_bench.py --phase chip
  (writes/merges perf/ring_attention.json)
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import re
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

B, H, D = 1, 8, 32  # flagship coarse attention geometry (d_model 256)


def _time_call(fn, *args, iters=5):
    import jax
    out = jax.block_until_ready(fn(*args))
    # harden against relay sync quirks: host fetch of one element
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def phase_mesh(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from loftr_tpu.ops.attention import full_attention
    from loftr_tpu.parallel.seq_attention import make_sharded_attention

    n = args.devices
    assert len(jax.devices()) >= n, \
        f"need {n} fake devices (XLA_FLAGS=--xla_force_host_platform_" \
        f"device_count={n})"
    mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
    ring = jax.jit(make_sharded_attention(mesh, "seq", kind="full"))
    oracle = jax.jit(lambda q, k, v, qm, km:
                     full_attention(q, k, v, q_mask=qm, kv_mask=km))

    rows = []
    for L in args.lengths:
        r = np.random.RandomState(0)
        sh = NamedSharding(mesh, P(None, "seq", None, None))
        msh = NamedSharding(mesh, P(None, "seq"))
        q = jax.device_put(
            (r.randn(B, L, H, D) * 0.2).astype(np.float32), sh)
        k = jax.device_put(
            (r.randn(B, L, H, D) * 0.2).astype(np.float32), sh)
        v = jax.device_put(
            (r.randn(B, L, H, D) * 0.2).astype(np.float32), sh)
        qm = jax.device_put(np.ones((B, L), bool), msh)
        km = jax.device_put(np.ones((B, L), bool), msh)

        # correctness on the way through
        got = np.asarray(ring(q, k, v, qm, km))
        want = np.asarray(oracle(jnp.asarray(np.asarray(q)),
                                 jnp.asarray(np.asarray(k)),
                                 jnp.asarray(np.asarray(v)),
                                 jnp.asarray(np.ones((B, L), bool)),
                                 jnp.asarray(np.ones((B, L), bool))))
        err = float(np.max(np.abs(got - want)))

        t_ring = _time_call(ring, q, k, v, qm, km, iters=args.iters)
        t_orc = _time_call(
            oracle, jnp.asarray(np.asarray(q)), jnp.asarray(np.asarray(k)),
            jnp.asarray(np.asarray(v)), jnp.asarray(np.ones((B, L), bool)),
            jnp.asarray(np.ones((B, L), bool)), iters=args.iters)

        # exchange volume from the compiled HLO: every collective-permute's
        # operand bytes x its trip count (fori_loop -> one permute per k/v/m
        # per ring step, n-1 useful trips)
        hlo = jax.jit(ring).lower(q, k, v, qm, km).compile().as_text()
        perm_bytes = 0
        for m in re.finditer(
                r"(f32|bf16|pred|u8)\[([\d,]*)\][^\n=]*"
                r"collective-permute(?:-start)?\(", hlo):
            dt_bytes = {"f32": 4, "bf16": 2, "pred": 1, "u8": 1}[m.group(1)]
            dims = [int(x) for x in m.group(2).split(",") if x]
            perm_bytes += dt_bytes * int(np.prod(dims)) if dims else dt_bytes
        analytic = 2 * (B * L * H * D * 4) + B * L * 1  # k+v f32, mask
        score_block_mb = B * (L // n) * H * (L // n) * 4 / 1e6
        full_score_mb = B * L * H * L * 4 / 1e6
        rows.append({
            "L": L, "n_shards": n,
            "max_abs_err_vs_oracle": err,
            "t_ring_s": round(t_ring, 4), "t_oracle_s": round(t_orc, 4),
            "hlo_permute_bytes_per_device_per_trip": perm_bytes,
            "analytic_exchange_bytes_per_trip_all_devices": analytic,
            "per_device_score_block_mb": round(score_block_mb, 2),
            "replicated_score_mb": round(full_score_mb, 1),
        })
        print(rows[-1], flush=True)
    return {"note": "CPU fake-device mesh: wall times are correctness-"
                    "grade only (shared cores); exchange volume and "
                    "score-block memory are exact",
            "rows": rows}


def phase_chip(args):
    import jax
    import jax.numpy as jnp

    from loftr_tpu.ops.attention import full_attention

    fn = jax.jit(lambda q, k, v: full_attention(q, k, v))
    feasible, ms = [], {}
    L = args.chip_start
    last_ok = None
    while L <= args.chip_max:
        r = np.random.RandomState(0)
        mk = lambda: jnp.asarray(
            (r.randn(B, L, H, D) * 0.2).astype(np.float32)).astype(
                jnp.bfloat16)
        try:
            q, k, v = mk(), mk(), mk()
            t = _time_call(fn, q, k, v, iters=3)
            ms[L] = round(t * 1e3, 1)
            last_ok = L
            feasible.append(L)
            print(f"L={L}: {ms[L]} ms", flush=True)
        except Exception as e:
            print(f"L={L}: FAILED ({str(e).splitlines()[0][:120]})",
                  flush=True)
            break
        L *= 2
    score_mb = {str(l): round(B * l * H * l * 4 / 1e6, 1)
                for l in feasible}
    return {
        "single_chip_max_L_full_attention": last_ok,
        "ms_by_L": ms,
        "score_matrix_mb_by_L": score_mb,
        "ring_capacity_model": (
            "per-device score block is [B, l_loc, H, s_loc] = 1/n^2 of the "
            "replicated matrix; an n-chip ring therefore runs full "
            "attention at ~n x the single-chip max L at equal per-device "
            "memory, exchanging only K/V/mask shards per trip"),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--phase", choices=["mesh", "chip"], required=True)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--lengths", type=int, nargs="+",
                    default=[2048, 4800, 9600])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chip-start", type=int, default=4800)
    ap.add_argument("--chip-max", type=int, default=1_000_000)
    ap.add_argument("--out", default=osp.join(REPO, "perf",
                                              "ring_attention.json"))
    args = ap.parse_args()

    data = {}
    if osp.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    if args.phase == "mesh":
        data["fake_mesh"] = phase_mesh(args)
    else:
        data["single_chip"] = phase_chip(args)
    data["geometry"] = {"B": B, "H": H, "D": D,
                        "note": "flagship coarse attention (d_model 256)"}
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
