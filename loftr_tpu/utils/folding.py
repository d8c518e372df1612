"""Inference-time BatchNorm folding for the ResNet-FPN backbone.

At eval time every BatchNorm in the backbone is a per-channel affine
transform with constant coefficients:

    y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
      = conv'(x) + b',   kernel' = kernel * gamma / sqrt(var + eps)
                         b'      = beta - mean * gamma / sqrt(var + eps)

Measured effect on TPU v5e: **perf-neutral** (backbone 2.625 -> 2.619
ms/image at B=32 bf16) — XLA already fuses the eval-mode affine + f32 casts
into the conv epilogue, so folding buys no wall-clock.  It is kept because
it (a) shrinks the inference param set and drops the batch_stats collection
entirely (simpler serving artifacts), and (b) is the standard deployment
transform users of the reference expect.  Numerics shift by f32
reassociation only (same top-K selections on real images, conf deltas
~1e-2 after the x10 softmax temperature amplification).

The reference has no equivalent (it always runs BatchNorm2d at eval,
src/loftr/backbone/resnet_fpn.py).  Training still uses live BatchNorm —
fold once after training / checkpoint conversion:

    cfg = fold_config(cfg)                      # backbone.norm -> "none"
    variables = fold_batchnorm(variables)       # conv kernels absorb BN
    out = LoFTR(cfg.loftr).apply(variables, inp)

Parity: tests/test_folding.py checks folded == batch-norm eval output
through the full matcher.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp

# Norm-module name -> paired conv name, per the module layout in
# loftr_tpu/models/backbone.py (stem: conv1/bn1; BasicBlock: conv1/bn1,
# conv2/bn2, downsample_conv/downsample_bn; FusionBlock: conv1/bn).
_BN_TO_CONV = {
    "bn1": "conv1",
    "bn2": "conv2",
    "bn": "conv1",
    "downsample_bn": "downsample_conv",
}

_EPS = 1e-5  # torch BatchNorm2d default, matches models/backbone.py Norm


def _fold_module(params: Mapping[str, Any],
                 stats: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursively fold one flax module dict (params + batch_stats)."""
    out: Dict[str, Any] = {}
    for name, sub in params.items():
        if name in _BN_TO_CONV and isinstance(sub, Mapping) and "bn" in sub:
            continue  # consumed below, paired with its conv
        if isinstance(sub, Mapping) and "kernel" in sub:
            # a conv; look for a norm sibling pointing at it
            bn_name = next(
                (b for b, c in _BN_TO_CONV.items()
                 if c == name and b in params
                 and isinstance(params[b], Mapping) and "bn" in params[b]),
                None)
            if bn_name is None:
                out[name] = dict(sub)  # bias-free lateral / fusion-out conv
                continue
            gamma = jnp.asarray(params[bn_name]["bn"]["scale"], jnp.float32)
            beta = jnp.asarray(params[bn_name]["bn"]["bias"], jnp.float32)
            mean = jnp.asarray(stats[bn_name]["bn"]["mean"], jnp.float32)
            var = jnp.asarray(stats[bn_name]["bn"]["var"], jnp.float32)
            factor = gamma / jnp.sqrt(var + _EPS)  # [O]
            kernel = jnp.asarray(sub["kernel"], jnp.float32)  # HWIO
            out[name] = {
                "kernel": kernel * factor,  # broadcast over output channels
                "bias": beta - mean * factor,
            }
        elif isinstance(sub, Mapping):
            out[name] = _fold_module(sub, stats.get(name, {}))
        else:
            out[name] = sub
    return out


def fold_batchnorm(variables: Mapping[str, Any],
                   backbone_key: str = "backbone") -> Dict[str, Any]:
    """Fold the backbone's BatchNorms into conv kernel+bias.

    Input: flax variables {'params': ..., 'batch_stats': ...} from a model
    built with backbone norm='batch'.  Returns variables for the same model
    built with norm='none' (no 'batch_stats' collection).
    """
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    if backbone_key not in params:
        raise KeyError(f"no '{backbone_key}' subtree in params")
    if backbone_key not in stats:
        raise KeyError("no batch_stats for the backbone — was the model "
                       "built with norm='batch'?")
    params[backbone_key] = _fold_module(params[backbone_key],
                                        stats[backbone_key])
    leftover = {k: v for k, v in stats.items() if k != backbone_key}
    if leftover:
        raise ValueError(f"unexpected batch_stats outside backbone: "
                         f"{sorted(leftover)}")
    return {"params": params}


def fold_config(cfg):
    """Return a copy of a Config (or ModelConfig) with backbone.norm='none'."""
    if hasattr(cfg, "loftr"):  # full Config
        return cfg.replaced({"loftr": {"backbone": {"norm": "none"}}})
    import dataclasses
    return dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, norm="none"))
