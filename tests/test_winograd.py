"""Winograd F(2x2,3x3) conv: exactness in fp32, bf16 error bounds, odd
shapes, and backbone integration parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu.ops.winograd import winograd_conv3x3, winograd_weights


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [(2, 8, 8, 5, 7), (1, 7, 9, 3, 4),
                                   (2, 23, 17, 16, 8)])
def test_winograd_exact_fp32(shape):
    B, H, W, Ci, Co = shape
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, Ci, Co) * 0.1, jnp.float32)
    ref = np.asarray(_direct(x, w))
    got = np.asarray(winograd_conv3x3(x, w))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_winograd_bias():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1, 8, 8, 4), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 4, 6) * 0.1, jnp.float32)
    b = jnp.asarray(r.randn(6), jnp.float32)
    ref = np.asarray(_direct(x, w)) + np.asarray(b)
    got = np.asarray(winograd_conv3x3(x, w, b))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_winograd_bf16_error_bounded():
    """bf16 winograd error stays within the bf16-quantization noise class
    (the transforms add one extra rounding step)."""
    r = np.random.RandomState(2)
    x32 = r.randn(2, 24, 32, 64).astype(np.float32)
    w32 = (r.randn(3, 3, 64, 32) * 0.05).astype(np.float32)
    ref = np.asarray(_direct(jnp.asarray(x32), jnp.asarray(w32)))
    got = np.asarray(winograd_conv3x3(
        jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32, jnp.bfloat16)
    ).astype(jnp.float32))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 2e-2, rel


def test_winograd_weights_shape():
    w = jnp.ones((3, 3, 4, 6), jnp.float32)
    u = winograd_weights(w)
    assert u.shape == (4, 4, 4, 6)


def test_backbone_winograd_parity():
    """BackboneConfig.winograd=True (inference) matches the direct-conv
    backbone in fp32 on CPU."""
    from loftr_tpu.models.backbone import build_backbone
    r = np.random.RandomState(3)
    imgs = jnp.asarray(r.rand(2, 64, 64, 1), jnp.float32)
    bb = build_backbone((8, 2), 16, (16, 24, 32), "batch")
    v = jax.jit(bb.init)(jax.random.PRNGKey(0), imgs)
    ref_c, ref_f = jax.jit(bb.apply)(v, imgs)
    bb_w = build_backbone((8, 2), 16, (16, 24, 32), "batch", winograd=True)
    got_c, got_f = jax.jit(bb_w.apply)(v, imgs)  # same param tree
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-4, atol=1e-4)
    # training always uses direct convs (differentiability of the direct
    # path is what the grad tests cover); apply with train=True still works
    out = bb_w.apply(v, imgs, True, mutable=["batch_stats"])[0]
    assert np.isfinite(np.asarray(out[0])).all()
