"""End-to-end SfM over a keyframed sequence (BASELINE.json config 5).

frames -> keyframe selection -> pairwise matching (LoFTR) -> per-edge RANSAC
pose (+ metric scale from depth when available) -> chained pose-graph init ->
union-find tracks -> triangulation -> Schur-complement BA -> trajectory.

The matcher is injected as a callable so the pipeline is testable with a
synthetic oracle and runnable with the real LoFTR matcher.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from loftr_tpu.eval.ransac import estimate_pose_ransac_jax
from loftr_tpu.sfm.bundle_adjustment import (BAProblem, bundle_adjust,
                                             reprojection_cost,
                                             reset_point_outliers)
from loftr_tpu.sfm.pose_graph import (Edge, build_tracks, chain_world_poses,
                                      metric_scale_from_depth,
                                      triangulate_pair)


def select_keyframes(n_frames: int, stride: int = 5) -> List[int]:
    """Fixed-stride keyframing."""
    return list(range(0, n_frames, stride))


def select_keyframes_adaptive(n_frames: int, match_fn: Callable,
                              min_matches: int = 300,
                              max_gap: int = 30,
                              min_gap: int = 2) -> List[int]:
    """Match-count-adaptive keyframing: advance from the last keyframe until
    the match count to the candidate frame drops below ``min_matches`` (or
    ``max_gap`` is hit), then promote the previous frame.  Guarantees
    consecutive keyframes stay well-matched for the pose graph."""
    kfs = [0]
    while kfs[-1] < n_frames - 1:
        last = kfs[-1]
        chosen = min(last + max_gap, n_frames - 1)
        for cand in range(last + min_gap, min(last + max_gap,
                                              n_frames - 1) + 1):
            k0, _, _, _ = match_fn(last, cand)
            if len(k0) < min_matches:
                chosen = max(cand - 1, last + min_gap)
                break
        chosen = max(chosen, last + 1)
        kfs.append(min(chosen, n_frames - 1))
    return kfs


def _normalize(kpts: np.ndarray, K: np.ndarray) -> np.ndarray:
    return (kpts - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]


def build_edges(keyframes: Sequence[int], match_fn: Callable,
                K: np.ndarray,
                depths: Optional[Sequence[np.ndarray]] = None,
                link_range: int = 2,
                rng: Optional[jax.Array] = None,
                min_matches: int = 16,
                pixel_thr: float = 1.0) -> List[Edge]:
    """Match keyframe pairs within ``link_range`` and estimate edge poses.

    match_fn(a, b) -> (kpts_a [M,2], kpts_b [M,2], cells_a [M], cells_b [M])
    in pixel coordinates, already filtered to valid matches.
    depths[k]: depth map of keyframe k (for metric scale), or None.
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng
    edges: List[Edge] = []
    for ai in range(len(keyframes)):
        for bi in range(ai + 1, min(ai + 1 + link_range, len(keyframes))):
            a, b = keyframes[ai], keyframes[bi]
            k0, k1, c0, c1 = match_fn(a, b)
            if len(k0) < min_matches:
                continue
            rng, sub = jax.random.split(rng)
            cap = max(64, 1 << int(np.ceil(np.log2(len(k0)))))
            pad0 = np.zeros((cap, 2), np.float32)
            pad1 = np.zeros((cap, 2), np.float32)
            pad0[: len(k0)] = k0
            pad1[: len(k1)] = k1
            valid = np.zeros(cap, bool)
            valid[: len(k0)] = True
            est = estimate_pose_ransac_jax(
                jnp.asarray(pad0), jnp.asarray(pad1), jnp.asarray(K),
                jnp.asarray(K), jnp.asarray(valid), sub,
                pixel_thr=pixel_thr)
            if not bool(est.ok) or int(est.num_inliers) < min_matches:
                continue
            R = np.asarray(est.R, np.float64)
            t = np.asarray(est.t, np.float64)
            inl = np.asarray(est.inliers)[: len(k0)]

            # metric scale from depth (RGB-D): triangulated vs measured z
            if depths is not None and depths[ai] is not None:
                n0 = _normalize(k0[inl], K)
                n1 = _normalize(k1[inl], K)
                _, z_tri = triangulate_pair(R, t, n0, n1)
                pix = np.round(k0[inl]).astype(int)
                h, w = depths[ai].shape
                pix[:, 0] = np.clip(pix[:, 0], 0, w - 1)
                pix[:, 1] = np.clip(pix[:, 1], 0, h - 1)
                z_meas = depths[ai][pix[:, 1], pix[:, 0]]
                s = metric_scale_from_depth(z_tri, z_meas)
                if s is not None and s > 0:
                    t = t * s
            edges.append(Edge(i=ai, j=bi, R=R, t=t,
                              kpts_i=k0[inl], kpts_j=k1[inl],
                              cells_i=c0[inl], cells_j=c1[inl]))
    return edges


def build_ba_problem(n_kf: int, edges: List[Edge], K: np.ndarray,
                     R_w: np.ndarray, t_w: np.ndarray,
                     max_obs: int = 8) -> Optional[BAProblem]:
    """Tracks -> triangulated landmarks -> static-shape BAProblem."""
    tracks = build_tracks(edges, max_obs_per_track=max_obs)
    if not tracks:
        return None
    P = len(tracks)
    obs_cam = np.zeros((P, max_obs), np.int32)
    obs_uv = np.zeros((P, max_obs, 2), np.float32)
    obs_w = np.zeros((P, max_obs), np.float32)
    points = np.zeros((P, 3), np.float64)
    keep = np.zeros(P, bool)
    for p, track in enumerate(tracks):
        # triangulate from the first two observations
        (fa, ka), (fb, kb) = track[0], track[1]
        Rrel = R_w[fb] @ R_w[fa].T
        trel = t_w[fb] - Rrel @ t_w[fa]
        X_a, z = triangulate_pair(Rrel, trel, _normalize(ka[None], K),
                                  _normalize(kb[None], K))
        if z[0] <= 0.05:
            continue
        # to world: X_w = R_a^T (X_a - t_a)
        points[p] = R_w[fa].T @ (X_a[0] - t_w[fa])
        keep[p] = True
        for o, (f, kp) in enumerate(track[:max_obs]):
            obs_cam[p, o] = f
            obs_uv[p, o] = _normalize(kp[None], K)[0]
            obs_w[p, o] = 1.0
    if keep.sum() == 0:
        return None
    fix = np.zeros(n_kf, bool)
    fix[0] = True
    sel = np.nonzero(keep)[0]
    return BAProblem(
        R=jnp.asarray(R_w, jnp.float32), t=jnp.asarray(t_w, jnp.float32),
        points=jnp.asarray(points[sel], jnp.float32),
        obs_uv=jnp.asarray(obs_uv[sel]),
        obs_cam=jnp.asarray(obs_cam[sel]),
        obs_w=jnp.asarray(obs_w[sel]),
        fix_mask=jnp.asarray(fix))


def run_sfm(n_frames: int, match_fn: Callable, K: np.ndarray,
            depths: Optional[Sequence[np.ndarray]] = None,
            keyframe_stride: int = 5, link_range: int = 2,
            ba_iters: int = 15, rng: Optional[jax.Array] = None,
            adaptive_keyframes: bool = False, min_matches_kf: int = 300,
            huber_delta: float = 0.002, ba_solver: str = "dense"):
    """Full pipeline.  Returns dict with keyframes, poses (R, t world->cam),
    edges, BA cost, and the solved BAProblem (or None).

    huber_delta > 0 runs an annealed robust BA schedule (Huber basin search
    then Tukey rejection) - the right default for real matcher output.
    ba_solver: 'dense' (exact reduced-system solve, keyframe scale) or
    'pcg' (matrix-free, for large keyframe counts)."""
    if adaptive_keyframes:
        kfs = select_keyframes_adaptive(n_frames, match_fn,
                                        min_matches=min_matches_kf)
    else:
        kfs = select_keyframes(n_frames, keyframe_stride)
    kf_depths = None if depths is None else [depths[k] for k in kfs]
    edges = build_edges(kfs, match_fn, K, kf_depths, link_range, rng)
    R_w, t_w = chain_world_poses(len(kfs), edges)
    prob = build_ba_problem(len(kfs), edges, K, R_w, t_w)
    cost = None
    if prob is not None:
        if huber_delta > 0:
            prob, _ = bundle_adjust(prob, max_iters=ba_iters,
                                    huber_delta=huber_delta * 10,
                                    solver=ba_solver)
            prob, _ = bundle_adjust(prob, max_iters=ba_iters,
                                    huber_delta=huber_delta * 2.5,
                                    solver=ba_solver)
            # outlier-vs-reset: retriangulate points from gated inlier
            # observations so Tukey doesn't reject good observations of
            # points an early outlier dragged off
            prob = reset_point_outliers(prob, huber_delta * 2.5)
            prob, cost = bundle_adjust(prob, max_iters=ba_iters,
                                       huber_delta=huber_delta,
                                       kernel="tukey", solver=ba_solver)
        else:
            prob, cost = bundle_adjust(prob, max_iters=ba_iters,
                                       solver=ba_solver)
        R_w = np.asarray(prob.R, np.float64)
        t_w = np.asarray(prob.t, np.float64)
    return {
        "keyframes": kfs,
        "R": R_w, "t": t_w,
        "edges": edges,
        "ba_cost": cost,
        "problem": prob,
    }
