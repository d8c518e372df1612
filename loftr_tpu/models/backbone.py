"""ResNet-FPN backbone (NHWC, TPU-native layout).

Same topology as /root/reference/src/loftr/backbone/resnet_fpn.py:
  - stem conv7x7/s2 -> 3 residual stages (dims block_dims, strides 1/2/2)
  - top-down FPN with 1x1 laterals, x2 align-corners bilinear upsample and
    3x3 fusion convs, emitting coarse (1/8, block_dims[2]) and fine
    (1/2, block_dims[0]) maps for the (8,2) variant, or (1/16, 1/4) for the
    (16,4) variant (resnet_fpn.py:43-118, :121-199).

Parameter names deliberately mirror the reference state-dict layout
(conv1/bn1/layer{1,2,3}_{0,1}/...,  *_outconv*) so converted PyTorch
checkpoints map 1:1 (see loftr_tpu/utils/weights.py).

Deliberate TPU-first deviations: NHWC layout; the align-corners upsample is a
pair of dense interpolation matmuls (ops/interpolate.py) instead of a gather.

Norm options: 'batch' mirrors reference BatchNorm2d (torch defaults eps=1e-5,
momentum=0.1 == flax momentum 0.9).  Under jit-with-sharding the batch axis
is global, so batch statistics are automatically synchronized across devices
- the GSPMD equivalent of the reference's sync_batchnorm (train.py:108).
'group' (GroupNorm-8) is a stat-sync-free alternative for very small
per-device batches.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from loftr_tpu.ops.interpolate import upsample2x_align_corners


def conv(features: int, kernel: int, stride: int = 1, name: str | None = None,
         dtype=None, bias: bool = False):
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=bias,
                   kernel_init=nn.initializers.variance_scaling(
                       2.0, "fan_out", "truncated_normal"),
                   dtype=dtype, name=name)


class WinoConv3x3(nn.Module):
    """Stride-1 3x3 conv evaluated via Winograd F(2x2,3x3)
    (ops/winograd.py) — 2.25x fewer MXU FLOPs than the direct form.

    Declares the SAME parameter tree as ``conv(features, 3)`` (nn.Conv's
    'kernel'/'bias'), so checkpoints and init are interchangeable with the
    direct path.  Inference fast path only; training and fp32-oracle runs
    keep nn.Conv.
    """
    features: int
    dtype: object = None
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        from loftr_tpu.ops.winograd import winograd_conv3x3
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out",
                                             "truncated_normal"),
            (3, 3, x.shape[-1], self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.bias else None)
        dt = self.dtype or x.dtype
        return winograd_conv3x3(x.astype(dt), kernel.astype(dt),
                                None if b is None else b.astype(dt))


def conv3x3(features: int, name: str, dtype=None, bias: bool = False,
            winograd: bool = False):
    """Stride-1 3x3 conv: direct (nn.Conv) or Winograd — same param tree."""
    if winograd:
        return WinoConv3x3(features, dtype, bias, name=name)
    return conv(features, 3, 1, name=name, dtype=dtype, bias=bias)



def _upsample(x, train: bool):
    """x2 align-corners upsample: Pallas NHWC-preserving kernel on the TPU
    bf16 inference path (ops/pallas/upsample.py - avoids the NHCW dot-output
    layouts that cost fused-relayout time around the downstream convs), XLA
    matmul oracle everywhere else (training backward, fp32, CPU).

    MEASURED RESULT: net negative, default OFF.  The kernel only fits the
    VMEM budget up to ~1/4-res maps (its full input-H slab plus Mosaic
    double buffering misses the 16 MB scoped limit by ~1 MB at 120x160),
    and applying it at the 60x80 site alone benched 133.8 vs 137.9 pairs/s
    - the NHCW<->NHWC boundary just moves next to the kernel instead of
    disappearing.  Flip _USE_PALLAS_UPSAMPLE to experiment."""
    if (_USE_PALLAS_UPSAMPLE and not train and x.dtype == jnp.bfloat16
            and x.shape[1] * x.shape[2] <= 60 * 80
            and jax.default_backend() == "tpu"):
        from loftr_tpu.ops.pallas.upsample import upsample2x_pallas
        return upsample2x_pallas(x)
    return upsample2x_align_corners(x)


_USE_PALLAS_UPSAMPLE = False


class Norm(nn.Module):
    """BatchNorm (torch-default eps/momentum), GroupNorm-8, or 'none'.

    Statistics are always computed in float32 regardless of the compute
    dtype (bf16 means/vars drift); output is cast back.

    'none' is the inference-only folded mode: the affine BN transform has
    been absorbed into the preceding conv's kernel + bias
    (loftr_tpu/utils/folding.py), so this module is the identity and the
    paired convs carry a bias term instead."""
    kind: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "none":
            return x
        orig = x.dtype
        if self.kind == "batch" and not train:
            # Inference BatchNorm is an affine map with CONSTANT per-channel
            # coefficients: fold them in fp32 (tiny [C] vectors), apply in
            # the compute dtype.  Upcasting the whole activation tensor to
            # fp32 (as the training path must for stats) doubles elementwise
            # HBM traffic and blocks XLA from fusing the normalize into the
            # producing conv's epilogue.  _BnEvalAffine declares the exact
            # same param/batch_stats tree as nn.BatchNorm(name='bn').
            return _BnEvalAffine(name="bn")(x)
        x = x.astype(jnp.float32)
        if self.kind == "batch":
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn")(x)
        elif self.kind == "group":
            y = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn")(x)
        else:
            raise ValueError(self.kind)
        return y.astype(orig)


class _BnEvalAffine(nn.Module):
    """Eval-mode BatchNorm as a folded per-channel affine.

    Same parameter/stats tree as flax ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var) so one variables dict drives both the training
    path (nn.BatchNorm, fp32 stats) and this inference path.  The folded
    inv/shift coefficients are computed in fp32 ([C] vectors, free), the
    tensor-wide multiply-add runs in the input dtype where XLA can fuse it
    into the producing conv's epilogue.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        inv = scale * jax.lax.rsqrt(var.value + self.epsilon)
        shift = bias - mean.value * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class BasicBlock(nn.Module):
    """Two 3x3 convs + norm with identity/projection shortcut
    (resnet_fpn.py:15-40)."""
    planes: int
    stride: int = 1
    norm: str = "batch"
    dtype: object = None
    winograd: bool = False  # stride-1 3x3 convs via ops/winograd.py

    @nn.compact
    def __call__(self, x, train: bool = False):
        fb = self.norm == "none"  # folded: bias absorbs the BN affine
        wg = self.winograd and not train
        if self.stride == 1:
            y = conv3x3(self.planes, "conv1", self.dtype, fb, wg)(x)
        else:
            y = conv(self.planes, 3, self.stride, name="conv1",
                     dtype=self.dtype, bias=fb)(x)
        y = nn.relu(Norm(self.norm, name="bn1")(y, train))
        y = conv3x3(self.planes, "conv2", self.dtype, fb, wg)(y)
        y = Norm(self.norm, name="bn2")(y, train)
        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, name="downsample_conv",
                     dtype=self.dtype, bias=fb)(x)
            x = Norm(self.norm, name="downsample_bn")(x, train)
        return nn.relu(x + y)


class FusionBlock(nn.Module):
    """3x3 -> norm -> LeakyReLU -> 3x3 fusion after lateral+upsample add
    (resnet_fpn.py:71-76)."""
    mid: int
    out: int
    norm: str = "batch"
    dtype: object = None
    winograd: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        wg = self.winograd and not train
        x = conv3x3(self.mid, "conv1", self.dtype,
                    self.norm == "none", wg)(x)
        x = nn.leaky_relu(Norm(self.norm, name="bn")(x, train),
                          negative_slope=0.01)
        return conv3x3(self.out, "conv2", self.dtype, False, wg)(x)


class ResNetFPN_8_2(nn.Module):
    """Outputs (coarse 1/8 @ block_dims[2], fine 1/2 @ block_dims[0])."""
    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    norm: str = "batch"
    dtype: object = None
    winograd: bool = False  # stride-1 3x3 convs via Winograd at inference

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.block_dims
        # stem (resnet_fpn.py:60-62)
        x0 = nn.relu(Norm(self.norm, name="bn1")(
            conv(self.initial_dim, 7, 2, name="conv1", dtype=self.dtype,
                 bias=self.norm == "none")(
                x.astype(self.dtype) if self.dtype else x), train))
        # stages (resnet_fpn.py:64-66): two BasicBlocks each
        x1 = BasicBlock(d[0], 1, self.norm, self.dtype, self.winograd, name="layer1_0")(x0, train)
        x1 = BasicBlock(d[0], 1, self.norm, self.dtype, self.winograd, name="layer1_1")(x1, train)  # 1/2
        x2 = BasicBlock(d[1], 2, self.norm, self.dtype, self.winograd, name="layer2_0")(x1, train)
        x2 = BasicBlock(d[1], 1, self.norm, self.dtype, self.winograd, name="layer2_1")(x2, train)  # 1/4
        x3 = BasicBlock(d[2], 2, self.norm, self.dtype, self.winograd, name="layer3_0")(x2, train)
        x3 = BasicBlock(d[2], 1, self.norm, self.dtype, self.winograd, name="layer3_1")(x3, train)  # 1/8

        # FPN top-down (resnet_fpn.py:107-116)
        x3_out = conv(d[2], 1, name="layer3_outconv", dtype=self.dtype)(x3)
        x3_up = _upsample(x3_out, train)
        x2_out = conv(d[2], 1, name="layer2_outconv", dtype=self.dtype)(x2)
        x2_out = FusionBlock(d[2], d[1], self.norm, self.dtype, self.winograd,
                             name="layer2_outconv2")(x2_out + x3_up, train)
        x2_up = _upsample(x2_out, train)
        x1_out = conv(d[1], 1, name="layer1_outconv", dtype=self.dtype)(x1)
        x1_out = FusionBlock(d[1], d[0], self.norm, self.dtype, self.winograd,
                             name="layer1_outconv2")(x1_out + x2_up, train)
        return x3_out, x1_out  # coarse [B,H/8,W/8,C3], fine [B,H/2,W/2,C1]


class ResNetFPN_16_4(nn.Module):
    """Outputs (coarse 1/16 @ block_dims[3], fine 1/4 @ block_dims[1])
    (resnet_fpn.py:121-199)."""
    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256, 512)
    norm: str = "batch"
    dtype: object = None
    winograd: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.block_dims
        x0 = nn.relu(Norm(self.norm, name="bn1")(
            conv(self.initial_dim, 7, 2, name="conv1", dtype=self.dtype,
                 bias=self.norm == "none")(
                x.astype(self.dtype) if self.dtype else x), train))
        x1 = BasicBlock(d[0], 1, self.norm, self.dtype, self.winograd, name="layer1_0")(x0, train)
        x1 = BasicBlock(d[0], 1, self.norm, self.dtype, self.winograd, name="layer1_1")(x1, train)  # 1/2
        x2 = BasicBlock(d[1], 2, self.norm, self.dtype, self.winograd, name="layer2_0")(x1, train)
        x2 = BasicBlock(d[1], 1, self.norm, self.dtype, self.winograd, name="layer2_1")(x2, train)  # 1/4
        x3 = BasicBlock(d[2], 2, self.norm, self.dtype, self.winograd, name="layer3_0")(x2, train)
        x3 = BasicBlock(d[2], 1, self.norm, self.dtype, self.winograd, name="layer3_1")(x3, train)  # 1/8
        x4 = BasicBlock(d[3], 2, self.norm, self.dtype, self.winograd, name="layer4_0")(x3, train)
        x4 = BasicBlock(d[3], 1, self.norm, self.dtype, self.winograd, name="layer4_1")(x4, train)  # 1/16

        x4_out = conv(d[3], 1, name="layer4_outconv", dtype=self.dtype)(x4)
        x4_up = _upsample(x4_out, train)
        x3_out = conv(d[3], 1, name="layer3_outconv", dtype=self.dtype)(x3)
        x3_out = FusionBlock(d[3], d[2], self.norm, self.dtype, self.winograd,
                             name="layer3_outconv2")(x3_out + x4_up, train)
        x3_up = _upsample(x3_out, train)
        x2_out = conv(d[2], 1, name="layer2_outconv", dtype=self.dtype)(x2)
        x2_out = FusionBlock(d[2], d[1], self.norm, self.dtype, self.winograd,
                             name="layer2_outconv2")(x2_out + x3_up, train)
        return x4_out, x2_out


def build_backbone(resolution: tuple, initial_dim: int,
                   block_dims: Sequence[int], norm: str = "batch",
                   name: str = "backbone", dtype=None,
                   winograd: bool = False):
    """Dispatch like backbone/__init__.py:4-11."""
    if tuple(resolution) == (8, 2):
        return ResNetFPN_8_2(initial_dim, tuple(block_dims), norm, dtype,
                             winograd, name=name)
    if tuple(resolution) == (16, 4):
        return ResNetFPN_16_4(initial_dim, tuple(block_dims), norm, dtype,
                              winograd, name=name)
    raise ValueError(f"unsupported resolution {resolution}")
