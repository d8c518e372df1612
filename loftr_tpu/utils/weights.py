"""PyTorch LoFTR checkpoint -> loftr_tpu variables converter.

Maps the reference's state-dict layout (see
/root/reference/src/loftr/loftr.py:13-27 module tree; ckpts store it under
['state_dict'] with an optional 'matcher.' prefix, lightning_loftr.py:46-49,
loftr.py:77-81) onto this framework's flax param/batch_stats tree.

Layout transforms:
  conv weight  [out, in, kh, kw] -> [kh, kw, in, out]
  linear weight [out, in]        -> [in, out]
  batchnorm weight/bias          -> params .../bn/{scale,bias}
  batchnorm running_mean/var     -> batch_stats .../bn/{mean,var}
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _set(tree: Dict, path: list, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


_BB_STAGE = re.compile(r"^layer([1-4])\.([01])\.(.*)$")
_OUTCONV2 = re.compile(r"^layer([1-4])_outconv2\.(\d)\.(.*)$")
_TX_LAYER = re.compile(r"^layers\.(\d+)\.(.*)$")


def _bn_leaf(torch_leaf: str):
    """(collection, leaf) for a BatchNorm tensor."""
    return {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "running_mean": ("batch_stats", "mean"),
        "running_var": ("batch_stats", "var"),
    }.get(torch_leaf, (None, None))


def _convert_backbone(key: str, val: np.ndarray, out: Dict):
    """backbone.* keys (resnet_fpn.py naming)."""
    if key.startswith("conv1."):
        _set(out["params"], ["backbone", "conv1", "kernel"], _conv(val))
        return True
    if key.startswith("bn1."):
        coll, leaf = _bn_leaf(key.split(".", 1)[1])
        if coll:
            _set(out[coll], ["backbone", "bn1", "bn", leaf], val)
        return True
    m = _BB_STAGE.match(key)
    if m:
        stage, blk, rest = m.group(1), m.group(2), m.group(3)
        scope = f"layer{stage}_{blk}"
        if rest.startswith("conv1."):
            _set(out["params"], ["backbone", scope, "conv1", "kernel"],
                 _conv(val))
        elif rest.startswith("conv2."):
            _set(out["params"], ["backbone", scope, "conv2", "kernel"],
                 _conv(val))
        elif rest.startswith("downsample.0."):
            _set(out["params"], ["backbone", scope, "downsample_conv",
                                 "kernel"], _conv(val))
        elif rest.startswith(("bn1.", "bn2.", "downsample.1.")):
            if rest.startswith("downsample.1."):
                norm_name, leaf_key = "downsample_bn", rest.split(".", 2)[2]
            else:
                norm_name, leaf_key = rest.split(".", 1)
            coll, leaf = _bn_leaf(leaf_key)
            if coll:
                _set(out[coll], ["backbone", scope, norm_name, "bn", leaf],
                     val)
        elif "num_batches_tracked" in rest:
            pass
        else:
            return False
        return True
    m = _OUTCONV2.match(key)
    if m:
        stage, idx, leaf_key = m.group(1), int(m.group(2)), m.group(3)
        scope = f"layer{stage}_outconv2"
        if idx == 0:
            _set(out["params"], ["backbone", scope, "conv1", "kernel"],
                 _conv(val))
        elif idx == 3:
            _set(out["params"], ["backbone", scope, "conv2", "kernel"],
                 _conv(val))
        elif idx == 1:
            coll, leaf = _bn_leaf(leaf_key)
            if coll:
                _set(out[coll], ["backbone", scope, "bn", "bn", leaf], val)
        return True
    if re.match(r"^layer[1-4]_outconv\.", key):
        scope = key.split(".")[0]
        _set(out["params"], ["backbone", scope, "kernel"], _conv(val))
        return True
    if "num_batches_tracked" in key:
        return True
    return False


def _convert_transformer(prefix: str, key: str, val: np.ndarray, out: Dict):
    """loftr_coarse.* / loftr_fine.* keys (transformer.py naming)."""
    m = _TX_LAYER.match(key)
    if not m:
        return "num_batches_tracked" in key
    i, rest = m.group(1), m.group(2)
    scope = [prefix, f"layer_{i}"]
    table = {
        "q_proj.weight": ("q_proj", "kernel", _linear),
        "k_proj.weight": ("k_proj", "kernel", _linear),
        "v_proj.weight": ("v_proj", "kernel", _linear),
        "merge.weight": ("merge", "kernel", _linear),
        "mlp.0.weight": ("mlp_0", "kernel", _linear),
        "mlp.2.weight": ("mlp_2", "kernel", _linear),
        "norm1.weight": ("norm1", "scale", lambda x: x),
        "norm1.bias": ("norm1", "bias", lambda x: x),
        "norm2.weight": ("norm2", "scale", lambda x: x),
        "norm2.bias": ("norm2", "bias", lambda x: x),
    }
    if rest not in table:
        return False
    mod, leaf, fn = table[rest]
    _set(out["params"], scope + [mod, leaf], fn(val))
    return True


def convert_torch_state_dict(state: Mapping[str, Any]) -> Dict[str, Dict]:
    """Convert a reference LoFTR state dict (numpy-valued) to flax variables.

    Accepts keys with or without the 'matcher.' prefix (loftr.py:77-81).
    Returns {'params': ..., 'batch_stats': ...}.  Raises on unknown keys so
    silent drops cannot corrupt a parity check.
    """
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for key, val in state.items():
        val = np.asarray(val)
        if key.startswith("matcher."):
            key = key[len("matcher."):]
        ok = True
        if key.startswith("backbone."):
            ok = _convert_backbone(key[len("backbone."):], val, out)
        elif key.startswith("loftr_coarse."):
            ok = _convert_transformer("loftr_coarse",
                                      key[len("loftr_coarse."):], val, out)
        elif key.startswith("loftr_fine."):
            ok = _convert_transformer("loftr_fine",
                                      key[len("loftr_fine."):], val, out)
        elif key == "fine_preprocess.down_proj.weight":
            _set(out["params"], ["down_proj", "kernel"], _linear(val))
        elif key == "fine_preprocess.down_proj.bias":
            _set(out["params"], ["down_proj", "bias"], val)
        elif key == "fine_preprocess.merge_feat.weight":
            _set(out["params"], ["merge_feat", "kernel"], _linear(val))
        elif key == "fine_preprocess.merge_feat.bias":
            _set(out["params"], ["merge_feat", "bias"], val)
        elif key == "coarse_matching.bin_score":
            _set(out["params"], ["bin_score"], val.reshape(()))
        elif "num_batches_tracked" in key:
            continue
        else:
            ok = False
        if not ok:
            raise KeyError(f"unmapped reference checkpoint key: {key!r}")
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Dict]:
    """Load a released .ckpt file (torch serialization) and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()})
