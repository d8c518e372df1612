"""Evaluation metrics: epipolar distance, pose error, AUC aggregation.

Reimplements /root/reference/src/utils/metrics.py with a JAX device path for
the per-match computations and numpy for scalar aggregation:

  - symmetric epipolar distance (metrics.py:30-47) - batched JAX.
  - relative pose error (metrics.py:12-27) - numpy.
  - pose AUC @ {5,10,20} by trapezoid-integrated recall (metrics.py:139-156).
  - precision @ epipolar threshold (metrics.py:159-170).
  - aggregate_metrics with identifier dedup (metrics.py:173-193).

Pose estimation itself lives in eval/pose.py (OpenCV parity path) and
eval/ransac.py (batched TPU path).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def essential_from_pose(T_0to1: jax.Array) -> jax.Array:
    """E = [t]_x R for T_0to1 [B, 4, 4] (metrics.py:55-56)."""
    t = T_0to1[:, :3, 3]
    R = T_0to1[:, :3, :3]
    zeros = jnp.zeros_like(t[:, 0])
    Tx = jnp.stack([
        jnp.stack([zeros, -t[:, 2], t[:, 1]], -1),
        jnp.stack([t[:, 2], zeros, -t[:, 0]], -1),
        jnp.stack([-t[:, 1], t[:, 0], zeros], -1),
    ], axis=1)
    return Tx @ R


def symmetric_epipolar_distance(pts0: jax.Array, pts1: jax.Array,
                                E: jax.Array, K0: jax.Array,
                                K1: jax.Array) -> jax.Array:
    """Squared symmetric epipolar distance (metrics.py:30-47).

    pts0, pts1: [B, M, 2] image px; E: [B, 3, 3]; K0, K1: [B, 3, 3].
    Returns [B, M].
    """
    f0 = jnp.stack([K0[:, 0, 0], K0[:, 1, 1]], -1)[:, None, :]
    c0 = jnp.stack([K0[:, 0, 2], K0[:, 1, 2]], -1)[:, None, :]
    f1 = jnp.stack([K1[:, 0, 0], K1[:, 1, 1]], -1)[:, None, :]
    c1 = jnp.stack([K1[:, 0, 2], K1[:, 1, 2]], -1)[:, None, :]
    p0 = (pts0 - c0) / f0
    p1 = (pts1 - c1) / f1
    p0h = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], -1)  # [B, M, 3]
    p1h = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], -1)

    # 'highest': the TPU default bf16 matmul passes perturb errors near
    # the 5e-4 precision threshold; the contraction is tiny (K=3)
    Ep0 = jnp.einsum("bij,bmj->bmi", E, p0h,
                     precision=jax.lax.Precision.HIGHEST)   # [B, M, 3]
    Etp1 = jnp.einsum("bji,bmj->bmi", E, p1h,
                      precision=jax.lax.Precision.HIGHEST)  # E^T p1
    p1Ep0 = jnp.sum(p1h * Ep0, -1)
    d = p1Ep0 ** 2 * (1.0 / (Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2) +
                      1.0 / (Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2))
    return d


def relative_pose_error(T_0to1: np.ndarray, R: np.ndarray, t: np.ndarray,
                        ignore_gt_t_thr: float = 0.0):
    """(t_err_deg, R_err_deg) (metrics.py:12-27)."""
    t_gt = T_0to1[:3, 3]
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    t_err = np.rad2deg(np.arccos(np.clip(np.dot(t, t_gt) / max(n, 1e-15),
                                         -1.0, 1.0)))
    t_err = np.minimum(t_err, 180 - t_err)  # E sign ambiguity
    if np.linalg.norm(t_gt) < ignore_gt_t_thr:
        t_err = 0.0
    R_gt = T_0to1[:3, :3]
    cos = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1.0, 1.0)
    R_err = np.rad2deg(np.abs(np.arccos(cos)))
    return float(t_err), float(R_err)


def error_auc(errors: Sequence[float],
              thresholds: Sequence[float] = (5, 10, 20)) -> Dict[str, float]:
    """Pose AUC by trapezoid-integrated recall curve (metrics.py:139-156)."""
    errors = [0] + sorted(float(e) for e in errors)
    recall = list(np.linspace(0, 1, len(errors)))
    aucs = {}
    for thr in thresholds:
        last_index = np.searchsorted(errors, thr)
        y = recall[:last_index] + [recall[last_index - 1]]
        x = errors[:last_index] + [thr]
        aucs[f"auc@{int(thr)}"] = float(np.trapezoid(y, x) / thr)
    return aucs


def epidist_prec(errors_per_pair: Sequence[np.ndarray],
                 thresholds: Sequence[float]) -> Dict[str, float]:
    """Mean per-pair precision at epipolar thresholds (metrics.py:159-170)."""
    out = {}
    for thr in thresholds:
        precs = [float(np.mean(errs < thr)) if len(errs) > 0 else 0.0
                 for errs in errors_per_pair]
        out[f"prec@{thr:.0e}"] = float(np.mean(precs)) if precs else 0.0
    return out


def aggregate_metrics(metrics: Dict[str, list],
                      epi_err_thr: float = 5e-4) -> Dict[str, float]:
    """Dataset-level aggregation with identifier dedup (metrics.py:173-193).

    metrics keys: 'identifiers', 'R_errs', 't_errs', 'epi_errs' (list of
    per-pair arrays).
    """
    unq_ids = OrderedDict(
        (iden, idx) for idx, iden in enumerate(metrics["identifiers"]))
    unq_ids = list(unq_ids.values())
    pose_errors = np.max(np.stack([
        np.asarray(metrics["R_errs"], np.float64),
        np.asarray(metrics["t_errs"], np.float64)]), axis=0)[unq_ids]
    aucs = error_auc(pose_errors, (5, 10, 20))
    epi = [np.asarray(metrics["epi_errs"][i]) for i in unq_ids]
    precs = epidist_prec(epi, [epi_err_thr])
    return {**aucs, **precs}
