"""Benchmark harness: matcher throughput on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference reports ~116 ms/pair (~8.6 pairs/s) for LoFTR-DS at
640x480 on an RTX 2080Ti (paper, arXiv:2104.00680; see BASELINE.md).
vs_baseline = measured pairs/s / 8.62.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_PAIRS_PER_S = 1000.0 / 116.0  # ~8.62, RTX 2080Ti (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    from loftr_tpu import LoFTR, MatchInput, get_config

    B, H, W = 2, 480, 640
    iters, warmup = 30, 5

    cfg = get_config("indoor_ds")
    model = LoFTR(cfg.loftr)
    rng = np.random.RandomState(0)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        return MatchInput(
            image0=jnp.asarray(r.rand(B, H, W, 1), jnp.float32),
            image1=jnp.asarray(r.rand(B, H, W, 1), jnp.float32),
        )

    inp = make_batch(0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inp)
    fwd = jax.jit(lambda v, i: model.apply(v, i))

    # two distinct input batches to defeat any caching along the tunnel
    batches = [make_batch(s) for s in range(2)]
    for i in range(warmup):
        out = fwd(variables, batches[i % 2])
    # force a host fetch: block_until_ready alone may not sync through the
    # axon relay, and a device->host value read cannot lie
    float(jnp.sum(out.mkpts0_f))

    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(iters):
        acc = acc + jnp.sum(fwd(variables, batches[i % 2]).mkpts0_f)
    _ = float(acc)  # host fetch = hard sync
    dt = time.perf_counter() - t0

    pairs_per_s = B * iters / dt
    result = {
        "metric": "loftr_ds_640x480_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / REFERENCE_PAIRS_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
