"""End-to-end SfM pipeline on a synthetic RGB-D sequence with an oracle
matcher: the recovered trajectory must match ground truth."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loftr_tpu.sfm.lie import exp_so3
from loftr_tpu.sfm.ate import absolute_trajectory_error, camera_centers
from loftr_tpu.sfm.pipeline import run_sfm
from loftr_tpu.sfm.pose_graph import build_tracks, Edge


class SynthScene:
    """Camera translating + slowly rotating through a 3D point cloud."""

    def __init__(self, n_frames=20, n_pts=400, seed=0, noise=0.2):
        rng = np.random.RandomState(seed)
        self.K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        self.pts = rng.rand(n_pts, 3) * [8, 5, 4] + [-4, -2.5, 4]
        self.noise = noise
        self.rng = rng
        self.R = np.zeros((n_frames, 3, 3))
        self.t = np.zeros((n_frames, 3))
        for f in range(n_frames):
            w = np.array([0.0, 0.015 * f, 0.002 * f])
            Rf = np.asarray(exp_so3(jnp.asarray(w[None])))[0]
            center = np.array([0.12 * f, 0.02 * np.sin(f), 0.01 * f])
            self.R[f] = Rf
            self.t[f] = -Rf @ center
        self.n_frames = n_frames

    def project(self, f):
        Xc = self.pts @ self.R[f].T + self.t[f]
        uv = Xc @ self.K.T
        uv = uv[:, :2] / uv[:, 2:]
        vis = (Xc[:, 2] > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < 635) & \
              (uv[:, 1] > 5) & (uv[:, 1] < 475)
        return uv, vis, Xc[:, 2]

    def depth_map(self, f):
        """Dense synthetic depth: nearest point depth per pixel block (coarse
        but adequate for scale estimation at match locations)."""
        uv, vis, z = self.project(f)
        depth = np.zeros((480, 640), np.float32)
        pix = np.round(uv[vis]).astype(int)
        depth[np.clip(pix[:, 1], 0, 479), np.clip(pix[:, 0], 0, 639)] = \
            z[vis]
        return depth

    def match_fn(self, a, b):
        """Oracle matcher: common visible points with pixel noise."""
        uva, visa, _ = self.project(a)
        uvb, visb, _ = self.project(b)
        common = np.nonzero(visa & visb)[0]
        k0 = uva[common] + self.rng.randn(len(common), 2) * self.noise
        k1 = uvb[common] + self.rng.randn(len(common), 2) * self.noise
        # track keys: point ids act as "coarse cells"
        return (k0.astype(np.float32), k1.astype(np.float32),
                common.astype(np.int64), common.astype(np.int64))


def test_sfm_pipeline_recovers_trajectory():
    scene = SynthScene(n_frames=20, noise=0.2, seed=0)
    depths = [scene.depth_map(f) for f in range(scene.n_frames)]
    out = run_sfm(scene.n_frames, scene.match_fn, scene.K, depths=depths,
                  keyframe_stride=4, link_range=2, ba_iters=15,
                  rng=jax.random.PRNGKey(0))
    kfs = out["keyframes"]
    assert len(out["edges"]) >= len(kfs) - 1
    assert out["ba_cost"] is not None

    est = camera_centers(out["R"], out["t"])
    gt = camera_centers(scene.R[kfs], scene.t[kfs])
    ate = absolute_trajectory_error(est, gt)
    # metric scale recovered from depth: alignment scale near 1
    assert abs(ate["scale"] - 1.0) < 0.1, ate
    assert ate["ate_rmse"] < 0.05, ate


def test_sfm_pipeline_without_depth_up_to_scale():
    scene = SynthScene(n_frames=16, noise=0.1, seed=1)
    out = run_sfm(scene.n_frames, scene.match_fn, scene.K, depths=None,
                  keyframe_stride=4, link_range=2, ba_iters=15,
                  rng=jax.random.PRNGKey(1))
    kfs = out["keyframes"]
    est = camera_centers(out["R"], out["t"])
    gt = camera_centers(scene.R[kfs], scene.t[kfs])
    ate = absolute_trajectory_error(est, gt, with_scale=True)
    # without depth every edge has unit-norm translation; Sim3-aligned
    # trajectory should still be consistent for a near-constant-velocity
    # sequence
    assert ate["ate_rmse"] < 0.2, ate


def test_build_tracks_chains_across_edges():
    e01 = Edge(0, 1, np.eye(3), np.zeros(3),
               np.array([[10.0, 10.0]]), np.array([[20.0, 10.0]]),
               np.array([5]), np.array([7]))
    e12 = Edge(1, 2, np.eye(3), np.zeros(3),
               np.array([[20.0, 10.0]]), np.array([[30.0, 10.0]]),
               np.array([7]), np.array([9]))
    tracks = build_tracks([e01, e12])
    assert len(tracks) == 1
    frames = [f for f, _ in tracks[0]]
    assert frames == [0, 1, 2]


def test_adaptive_keyframes():
    from loftr_tpu.sfm.pipeline import select_keyframes_adaptive
    scene = SynthScene(n_frames=30, noise=0.1, seed=2)
    kfs = select_keyframes_adaptive(scene.n_frames, scene.match_fn,
                                    min_matches=150, max_gap=10)
    assert kfs[0] == 0 and kfs[-1] == scene.n_frames - 1
    assert all(b > a for a, b in zip(kfs, kfs[1:]))
    # consecutive keyframes stay well matched
    for a, b in zip(kfs, kfs[1:]):
        k0, _, _, _ = scene.match_fn(a, b)
        assert len(k0) >= 100, (a, b, len(k0))
