"""Sub-stage marginal costs of the ResNet-FPN backbone on the real chip.

Same unrolled-marginal method as tools/stage_costs.py, applied inside the
backbone: stem, layer1 (1/2), layer2 (1/4), layer3 (1/8), FPN coarse path,
FPN fine path.  Identifies which convolutions keep the backbone at ~57% MFU
(the backbone is 80% of model FLOPs, docs/PERFORMANCE.md).

Usage: python tools/backbone_costs.py [--batch 32] [--n 5] [--pad-channels]
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
    import flax.linen as nn
    from loftr_tpu.config import get_config
    from loftr_tpu.models.backbone import (BasicBlock, FusionBlock, Norm,
                                           conv)
    from loftr_tpu.ops.interpolate import upsample2x_align_corners

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--pad-channels", action="store_true",
                    help="use block_dims (128,256,256) like bench.py's "
                         "--pad-channels path")
    args = ap.parse_args()

    d = (128, 256, 256) if args.pad_channels else (128, 196, 256)
    dt = jnp.dtype(args.dtype) if args.dtype != "float32" else None
    B, H, W = args.batch, 480, 640
    N = args.n
    rng = np.random.RandomState(0)
    n_img = 2 * B

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.relu(Norm("batch", name="bn1")(
                conv(128, 7, 2, name="conv1", dtype=dt)(
                    x.astype(dt) if dt else x), False))

    class Layer1(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = BasicBlock(d[0], 1, "batch", dt, name="layer1_0")(x, False)
            return BasicBlock(d[0], 1, "batch", dt, name="layer1_1")(x, False)

    class Layer2(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = BasicBlock(d[1], 2, "batch", dt, name="layer2_0")(x, False)
            return BasicBlock(d[1], 1, "batch", dt, name="layer2_1")(x, False)

    class Layer3(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = BasicBlock(d[2], 2, "batch", dt, name="layer3_0")(x, False)
            return BasicBlock(d[2], 1, "batch", dt, name="layer3_1")(x, False)

    class FpnCoarse(nn.Module):  # 1/8 out + 1/4 fusion stack
        @nn.compact
        def __call__(self, x3, x2):
            x3_out = conv(d[2], 1, name="layer3_outconv", dtype=dt)(x3)
            x2_out = conv(d[2], 1, name="layer2_outconv", dtype=dt)(x2)
            x2_out = FusionBlock(d[2], d[1], "batch", dt,
                                 name="layer2_outconv2")(
                x2_out + upsample2x_align_corners(x3_out), False)
            return x3_out, x2_out

    class FpnFine(nn.Module):  # 1/2 fusion stack -> fine features
        @nn.compact
        def __call__(self, x1, x2_out):
            x1_out = conv(d[1], 1, name="layer1_outconv", dtype=dt)(x1)
            return FusionBlock(d[1], d[0], "batch", dt,
                               name="layer1_outconv2")(
                x1_out + upsample2x_align_corners(x2_out), False)

    imgs = jnp.asarray(rng.rand(n_img, H, W, 1), jnp.float32)
    x0 = jnp.asarray(rng.rand(n_img, H // 2, W // 2, 128), jnp.float32)
    x1 = jnp.asarray(rng.rand(n_img, H // 2, W // 2, d[0]), jnp.float32)
    x2 = jnp.asarray(rng.rand(n_img, H // 4, W // 4, d[1]), jnp.float32)
    x3 = jnp.asarray(rng.rand(n_img, H // 8, W // 8, d[2]), jnp.float32)
    x2o = jnp.asarray(rng.rand(n_img, H // 4, W // 4, d[1]), jnp.float32)
    if dt:
        x0, x1, x2, x3, x2o = (t.astype(dt) for t in (x0, x1, x2, x3, x2o))

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def stage(name, module, inputs, gflop_pair):
        mod = module()
        v = jax.jit(mod.init)(jax.random.PRNGKey(0),
                              *(t[:2] for t in inputs))

        @jax.jit
        def one(v, *xs):
            out = mod.apply(v, *xs)
            return sum(jnp.sum(o) for o in jax.tree.leaves(out))

        @jax.jit
        def many(v, *xs):
            acc = jnp.zeros(())
            for k in range(N):
                shifted = tuple(x + k * 1e-6 for x in xs)
                out = mod.apply(v, *shifted)
                acc += sum(jnp.sum(o) for o in jax.tree.leaves(out))
            return acc

        t1 = timed(lambda: float(one(v, *inputs)))
        tn = timed(lambda: float(many(v, *inputs)))
        per = (tn - t1) / (N - 1) / B
        mfu = gflop_pair / 197e3 / per if per > 0 else 0
        print(f"{name:12s}: {per * 1e3:7.3f} ms/pair   "
              f"~{gflop_pair:5.1f} GF/pair  MFU {mfu * 100:4.1f}%",
              flush=True)
        return per

    px = {"half": (H // 2) * (W // 2), "quarter": (H // 4) * (W // 4),
          "eighth": (H // 8) * (W // 8)}
    gf = lambda cin, cout, k, p: 2 * k * k * cin * cout * p * 2 / 1e9  # /pair

    g_stem = gf(1, 128, 7, px["half"])
    g_l1 = 4 * gf(d[0], d[0], 3, px["half"])
    g_l2 = (gf(d[0], d[1], 3, px["quarter"]) + 3 * gf(d[1], d[1], 3, px["quarter"])
            + gf(d[0], d[1], 1, px["quarter"]))
    g_l3 = (gf(d[1], d[2], 3, px["eighth"]) + 3 * gf(d[2], d[2], 3, px["eighth"])
            + gf(d[1], d[2], 1, px["eighth"]))
    g_fc = (gf(d[2], d[2], 1, px["eighth"]) + gf(d[1], d[2], 1, px["quarter"])
            + gf(d[2], d[2], 3, px["quarter"]) + gf(d[2], d[1], 3, px["quarter"]))
    g_ff = (gf(d[0], d[1], 1, px["half"]) + gf(d[1], d[1], 3, px["half"])
            + gf(d[1], d[0], 3, px["half"]))

    total = 0.0
    total += stage("stem", Stem, (imgs,), g_stem)
    total += stage("layer1", Layer1, (x0,), g_l1)
    total += stage("layer2", Layer2, (x1,), g_l2)
    total += stage("layer3", Layer3, (x2,), g_l3)
    total += stage("fpn_coarse", FpnCoarse, (x3, x2), g_fc)
    total += stage("fpn_fine", FpnFine, (x1, x2o), g_ff)
    g_total = g_stem + g_l1 + g_l2 + g_l3 + g_fc + g_ff
    print(f"{'sum':12s}: {total * 1e3:7.3f} ms/pair   ~{g_total:5.1f} GF/pair"
          f"  MFU {g_total / 197e3 / total * 100:4.1f}%")


if __name__ == "__main__":
    main()
