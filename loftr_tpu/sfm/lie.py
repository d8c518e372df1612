"""Minimal SO(3)/SE(3) Lie-group utilities (closed form, batch-friendly).

Used by the pose-graph/BA backend (new scope - no reference counterpart;
BASELINE.json north star)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], axis=-2)


def exp_so3(w: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    W = hat(w)
    W2 = W @ W
    t = jnp.maximum(theta, eps)
    A = jnp.where(theta < eps, 1.0 - theta ** 2 / 6, jnp.sin(t) / t)
    B = jnp.where(theta < eps, 0.5 - theta ** 2 / 24,
                  (1 - jnp.cos(t)) / t ** 2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def log_so3(R: jax.Array, eps: float = 1e-7) -> jax.Array:
    """[..., 3, 3] -> [..., 3] axis-angle."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    theta = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    scale = jnp.where(theta[..., None] < eps, 0.5,
                      theta[..., None] / (2 * jnp.sin(theta[..., None])))
    return w * scale


def exp_se3(xi: jax.Array) -> jax.Array:
    """[..., 6] (w, v) -> [..., 4, 4] rigid transform (rotation-first
    convention; translation uses the V matrix)."""
    w, v = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    W = hat(w)
    W2 = W @ W
    t = jnp.maximum(theta, 1e-8)
    A = jnp.where(theta < 1e-6, 1.0 - theta ** 2 / 6, jnp.sin(t) / t)
    B = jnp.where(theta < 1e-6, 0.5 - theta ** 2 / 24,
                  (1 - jnp.cos(t)) / t ** 2)
    C = jnp.where(theta < 1e-6, 1.0 / 6 - theta ** 2 / 120,
                  (1 - A) / t ** 2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A * W + B * W2
    V = eye + B * W + C * W2
    tvec = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, tvec[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype),
        top.shape[:-2] + (4,))[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def compose(T1: jax.Array, T2: jax.Array) -> jax.Array:
    return T1 @ T2


def inv_se3(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], T.dtype),
        top.shape[:-2] + (4,))[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)
