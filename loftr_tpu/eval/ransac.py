"""Batched RANSAC essential-matrix estimation + pose recovery, on-device.

TPU-native replacement for cv2.findEssentialMat/recoverPose
(/root/reference/src/utils/metrics.py:83-93), which the reference calls
per-pair on the CPU inside the eval loop - its #1 non-NN hot spot
(SURVEY.md §2.9).  Design:

  - all H hypotheses are evaluated in parallel (vmapped 8-point solves on
    small SVDs), not sequentially - RANSAC as one big batched program;
  - static match capacity K with validity mask (invalid rows get zero
    sampling probability and zero score weight);
  - final E is refit on the best hypothesis's inliers (weighted DLT);
  - pose recovered by E decomposition + cheirality voting over triangulated
    inliers (the recoverPose equivalent).

The OpenCV path (eval/pose.py) remains the parity oracle; this solver is the
scale path and the SfM backend's inner kernel.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoseEstimate(NamedTuple):
    R: jax.Array          # [3, 3]
    t: jax.Array          # [3]
    E: jax.Array          # [3, 3]
    inliers: jax.Array    # [K] bool
    num_inliers: jax.Array
    ok: jax.Array         # bool: enough valid matches


def _normalize(kpts: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel -> normalized camera coords. kpts [K, 2], K [3, 3]."""
    f = jnp.stack([K[0, 0], K[1, 1]])
    c = jnp.stack([K[0, 2], K[1, 2]])
    return (kpts - c) / f


def _eight_point(p0: jax.Array, p1: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point: solve min ||A e|| for E from n>=8 correspondences.

    p0, p1: [n, 2] normalized coords; w: [n] weights.
    Returns E [3, 3] projected onto the essential manifold (sv (1,1,0)).
    """
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    ones = jnp.ones_like(x0)
    # epipolar constraint p1^T E p0 = 0, row = [x1x0 x1y0 x1 y1x0 y1y0 y1 x0 y0 1]
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, ones], axis=-1)  # [n, 9]
    A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    # project to essential manifold
    u, s, vt2 = jnp.linalg.svd(E)
    E = u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E.dtype)) @ vt2
    return E


def _sampson_sq(E: jax.Array, p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Squared Sampson distance (first-order geometric error). [K]."""
    p0h = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], -1)
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)
    Ep0 = p0h @ E.T            # [K, 3]
    Etp1 = p1h @ E             # [K, 3]
    num = jnp.sum(p1h * Ep0, -1) ** 2
    den = Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _triangulate_depths(R: jax.Array, t: jax.Array, p0: jax.Array,
                        p1: jax.Array):
    """Midpoint-free two-view triangulation depths.

    Solve z1 * x1 = z0 * R x0 + t for each correspondence by least squares
    over (z0, z1).  Returns (z0, z1) [K] each.
    """
    x0 = jnp.concatenate([p0, jnp.ones_like(p0[:, :1])], -1)  # [K, 3]
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)
    Rx0 = x0 @ R.T                                            # [K, 3]
    # [Rx0, -x1] [z0, z1]^T = -t  -> normal equations per correspondence
    a11 = jnp.sum(Rx0 * Rx0, -1)
    a12 = -jnp.sum(Rx0 * x1, -1)
    a22 = jnp.sum(x1 * x1, -1)
    b1 = -jnp.sum(Rx0 * t, -1)
    b2 = jnp.sum(x1 * t, -1)
    det = a11 * a22 - a12 * a12
    z0 = (b1 * a22 - b2 * a12) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (a11 * b2 - a12 * b1) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return z0, z1


def _decompose_and_vote(E: jax.Array, p0: jax.Array, p1: jax.Array,
                        w: jax.Array):
    """E -> (R, t) by cheirality voting over the 4 decompositions."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    tv = u[:, 2]
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([tv, -tv, tv, -tv])

    def vote(R, t):
        z0, z1 = _triangulate_depths(R, t, p0, p1)
        return jnp.sum(((z0 > 0) & (z1 > 0)) * w)

    votes = jax.vmap(vote)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best]


@partial(jax.jit, static_argnames=("num_hypotheses", "solver"))
def estimate_pose_ransac_jax(kpts0: jax.Array, kpts1: jax.Array,
                             K0: jax.Array, K1: jax.Array,
                             valid: jax.Array, rng: jax.Array,
                             pixel_thr: float = 0.5,
                             num_hypotheses: int = 512,
                             solver: str = "8pt") -> PoseEstimate:
    """Estimate relative pose for ONE pair with static shapes.

    kpts0/kpts1: [K, 2] pixel coords (padded); valid: [K] bool;
    pixel_thr: inlier threshold in px (normalized by mean focal as in
    metrics.py:80).  vmap over pairs for batched eval.

    solver '8pt': weighted-DLT hypotheses from 8 samples (cheap, needs the
    larger sample to be outlier-free).  solver '5pt': minimal 5-point
    hypotheses via the on-device hidden-variable solver
    (eval/five_point_tpu.py) - up to 10 essential matrices per sample, much
    higher all-inlier sample probability at heavy outlier rates.

    Matmul precision is pinned to 'highest' for the whole estimator: on
    TPU the default f32 matmul truncates to bf16 passes on the MXU, which
    degrades the DLT/minimal-solver SVDs and the cheirality vote (see
    five_point_tpu.solve_5point_batched for the measured failure).  All
    matrices here are tiny, so the cost is dispatch-bound anyway.
    """
    with jax.default_matmul_precision("highest"):
        return _estimate_pose_ransac_impl(kpts0, kpts1, K0, K1, valid, rng,
                                          pixel_thr, num_hypotheses, solver)


def _estimate_pose_ransac_impl(kpts0, kpts1, K0, K1, valid, rng,
                               pixel_thr, num_hypotheses, solver):
    Kcap = kpts0.shape[0]
    p0 = _normalize(kpts0, K0)
    p1 = _normalize(kpts1, K1)
    wf = valid.astype(p0.dtype)
    thr = pixel_thr / ((K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1]) / 4.0)
    thr_sq = thr * thr

    n_valid = jnp.sum(valid)
    ok = n_valid >= (8 if solver == "8pt" else 6)

    # hypothesis sampling: categorical over valid matches
    logits = jnp.where(valid, 0.0, -1e9)

    if solver == "5pt":
        from loftr_tpu.eval.five_point_tpu import _solve_5point_single
        samples = jax.random.categorical(
            rng, logits[None, None, :], axis=-1,
            shape=(num_hypotheses, 5))                   # [H, 5]
        Es, Eok = jax.vmap(lambda idx: _solve_5point_single(
            p0[idx], p1[idx]))(samples)                  # [H,10,3,3] [H,10]
        Es = Es.reshape(-1, 3, 3)                        # [H*10, 3, 3]

        def score_one(E, e_ok):
            inl = (_sampson_sq(E, p0, p1) < thr_sq) & valid
            return jnp.where(e_ok, jnp.sum(inl), -1)

        scores = jax.vmap(score_one)(Es, Eok.reshape(-1))
    else:
        samples = jax.random.categorical(
            rng, logits[None, None, :], axis=-1,
            shape=(num_hypotheses, 8))                   # [H, 8]

        def solve_one(idx):
            E = _eight_point(p0[idx], p1[idx], jnp.ones((8,), p0.dtype))
            err = _sampson_sq(E, p0, p1)
            inl = (err < thr_sq) & valid
            return E, jnp.sum(inl)

        Es, scores = jax.vmap(solve_one)(samples)        # [H,3,3], [H]
    best = jnp.argmax(scores)
    E_best = Es[best]

    # local optimization: IRLS with annealed Cauchy weights.  A plain
    # refit-on-consensus is catastrophically sensitive to points a few px off
    # (quadratic algebraic cost), so residuals are robustly down-weighted
    # w = 1/(1 + e/c^2) with c annealed 4x -> 1x of the inlier threshold;
    # the best model (by inlier count at thr) seen at any round is kept.
    n_best = jnp.sum((_sampson_sq(E_best, p0, p1) < thr_sq) & valid)
    E_cur, E_fin, n_fin = E_best, E_best, n_best
    for mult in (16.0, 8.0, 4.0, 2.0, 1.0, 1.0):
        e = _sampson_sq(E_cur, p0, p1)
        w = wf / (1.0 + e / (thr_sq * mult))
        E_cur = _eight_point(p0, p1, w)
        n_new = jnp.sum((_sampson_sq(E_cur, p0, p1) < thr_sq) & valid)
        better = n_new >= n_fin
        E_fin = jnp.where(better, E_cur, E_fin)
        n_fin = jnp.where(better, n_new, n_fin)
    inl_fin = (_sampson_sq(E_fin, p0, p1) < thr_sq) & valid

    R, t = _decompose_and_vote(E_fin, p0, p1, inl_fin.astype(p0.dtype))
    return PoseEstimate(R=R, t=t, E=E_fin, inliers=inl_fin,
                        num_inliers=jnp.sum(inl_fin), ok=ok)
