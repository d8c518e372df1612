"""Inference-time channel padding of the ResNet-FPN backbone to MXU widths.

The reference backbone's middle stage uses 196 channels
(/root/reference/src/loftr/backbone/resnet_fpn.py block_dims (128, 196,
256)).  TPU MXU/VPU lanes come in 128s, so every 196-channel conv pads to
256 lanes internally - but XLA's generated code for the odd width is also
measurably slower than a true 256-channel conv: on v5e at 240x320xB64,
conv3x3(196) takes 49.5 ms vs 40.0 ms for conv3x3(256), despite the
latter doing 1.7x the "real" work.

Zero-padding the weights is FUNCTION-PRESERVING: padded input channels
carry zeros, padded kernel rows/columns are zero, padded BatchNorm
channels use (mean 0, var 1, scale 0, bias 0) so they emit exactly 0, and
ReLU/LeakyReLU/upsample/residual-add all map 0 -> 0.  The padded model
computes the identical function as the (128, 196, 256) reference
architecture - the extra channels are structural zeros, not parameters.

Usage (inference only - training would start learning the zero channels):

    variables = pad_backbone_channels(variables)       # 196 -> 256
    cfg = pad_config(cfg)                              # block_dims update
    out = LoFTR(cfg.loftr).apply(variables, inp)

Parity: tests/test_folding.py::test_channel_pad_* (exact-function check
through the full matcher).  Composes with fold_batchnorm (either order).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _pad_array(name: str, x, from_dim: int, to_dim: int):
    """Pad every axis of size from_dim; batch_stats 'var' pads with 1."""
    x = jnp.asarray(x)
    pad = [(0, to_dim - d) if d == from_dim else (0, 0) for d in x.shape]
    if not any(p != (0, 0) for p in pad):
        return x
    fill = 1.0 if name == "var" else 0.0
    return jnp.pad(x, pad, constant_values=fill)


def _pad_tree(tree: Mapping[str, Any], from_dim: int,
              to_dim: int) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for name, sub in tree.items():
        if isinstance(sub, Mapping):
            out[name] = _pad_tree(sub, from_dim, to_dim)
        else:
            out[name] = _pad_array(name, sub, from_dim, to_dim)
    return out


def pad_backbone_channels(variables: Mapping[str, Any],
                          from_dim: int = 196, to_dim: int = 256,
                          backbone_key: str = "backbone") -> Dict[str, Any]:
    """Zero-pad every `from_dim`-sized channel axis in the backbone.

    Works on {'params', 'batch_stats'} variables (norm='batch') and on
    folded variables (norm='none', conv bias present).
    """
    out: Dict[str, Any] = {}
    for col, coltree in variables.items():
        colout = dict(coltree)
        if backbone_key in colout:
            colout[backbone_key] = _pad_tree(colout[backbone_key],
                                             from_dim, to_dim)
        out[col] = colout
    return out


def infer_backbone_overrides(variables: Mapping[str, Any]) -> Dict[str, Any]:
    """Derive {'backbone': {'norm', 'block_dims'}} from a variables tree.

    Lets entry points (api.match_pair, serve.MatchingService) accept
    variables that went through fold_batchnorm and/or
    pad_backbone_channels without the caller re-stating the config: the
    transforms are visible in the tree (batch_stats collection present or
    not; conv kernel widths).
    """
    bb = variables["params"]["backbone"]
    if "bn" in bb.get("bn1", {}):
        norm = "batch"
    elif "gn" in bb.get("bn1", {}):
        norm = "group"
    else:
        norm = "none"
    dims = []
    for i in (1, 2, 3, 4):
        layer = bb.get(f"layer{i}_0")
        if layer is None:
            break
        dims.append(int(layer["conv1"]["kernel"].shape[-1]))
    return {"backbone": {"norm": norm, "block_dims": tuple(dims)}}


def pad_config(cfg, from_dim: int = 196, to_dim: int = 256):
    """Config (or ModelConfig) copy with block_dims' from_dim -> to_dim."""
    import dataclasses

    def fix(mc):
        dims = tuple(to_dim if d == from_dim else d
                     for d in mc.backbone.block_dims)
        return dataclasses.replace(
            mc, backbone=dataclasses.replace(mc.backbone, block_dims=dims))

    if hasattr(cfg, "loftr"):
        return dataclasses.replace(cfg, loftr=fix(cfg.loftr))
    return fix(cfg)
