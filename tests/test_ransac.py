"""Tests for the batched JAX RANSAC pose solver on synthetic geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from loftr_tpu.eval.ransac import estimate_pose_ransac_jax
from loftr_tpu.eval.metrics import relative_pose_error


def _synth_pair(n=200, n_outliers=40, noise=0.0, seed=0):
    """Generate a synthetic two-view geometry with known relative pose."""
    rng = np.random.RandomState(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    # random rotation (small) + translation
    aa = rng.randn(3) * 0.1
    angle = np.linalg.norm(aa)
    axis = aa / angle
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
    t = rng.randn(3)
    t /= np.linalg.norm(t)

    pts3d = rng.rand(n, 3) * [4, 3, 4] + [-2, -1.5, 4]  # in front of cam0
    p0 = pts3d @ K.T
    p0 = p0[:, :2] / p0[:, 2:]
    pts_c1 = pts3d @ R.T + t
    p1 = pts_c1 @ K.T
    p1 = p1[:, :2] / p1[:, 2:]
    if noise > 0:
        p0 += rng.randn(n, 2) * noise
        p1 += rng.randn(n, 2) * noise
    # outliers
    idx = rng.choice(n, n_outliers, replace=False)
    p1[idx] = rng.rand(n_outliers, 2) * [640, 480]
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return p0.astype(np.float32), p1.astype(np.float32), \
        K.astype(np.float32), T, idx


def test_ransac_recovers_pose():
    p0, p1, K, T, _ = _synth_pair(noise=0.3)
    est = estimate_pose_ransac_jax(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(K), jnp.asarray(K),
        jnp.ones(len(p0), bool), jax.random.PRNGKey(0), pixel_thr=1.0)
    assert bool(est.ok)
    assert int(est.num_inliers) > 120
    t_err, r_err = relative_pose_error(T, np.asarray(est.R),
                                       np.asarray(est.t))
    assert r_err < 1.0, f"rotation error {r_err} deg"
    assert t_err < 3.0, f"translation error {t_err} deg"


def test_ransac_rejects_outliers():
    p0, p1, K, T, out_idx = _synth_pair(n=150, n_outliers=60, noise=0.2, seed=3)
    est = estimate_pose_ransac_jax(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(K), jnp.asarray(K),
        jnp.ones(len(p0), bool), jax.random.PRNGKey(1), pixel_thr=1.0)
    inl = np.asarray(est.inliers)
    # the 60 planted outliers must be overwhelmingly excluded (a handful of
    # random points can legitimately land on an epipolar line)
    assert inl[out_idx].sum() <= 4
    t_err, r_err = relative_pose_error(T, np.asarray(est.R),
                                       np.asarray(est.t))
    assert r_err < 1.5 and t_err < 5.0


def test_ransac_with_padding_mask():
    p0, p1, K, T, _ = _synth_pair(n=100, n_outliers=10, noise=0.2, seed=5)
    # pad to capacity 256 with garbage rows marked invalid
    cap = 256
    pad0 = np.zeros((cap, 2), np.float32)
    pad1 = np.zeros((cap, 2), np.float32)
    pad0[:100] = p0
    pad1[:100] = p1
    valid = np.zeros(cap, bool)
    valid[:100] = True
    est = estimate_pose_ransac_jax(
        jnp.asarray(pad0), jnp.asarray(pad1), jnp.asarray(K),
        jnp.asarray(K), jnp.asarray(valid), jax.random.PRNGKey(2),
        pixel_thr=1.0)
    assert not np.asarray(est.inliers)[100:].any(), \
        "padded rows must never be inliers"
    t_err, r_err = relative_pose_error(T, np.asarray(est.R),
                                       np.asarray(est.t))
    assert r_err < 1.5 and t_err < 5.0


def test_ransac_too_few_matches_flags_not_ok():
    p0 = np.zeros((16, 2), np.float32)
    p1 = np.zeros((16, 2), np.float32)
    K = np.eye(3, dtype=np.float32) * 100
    valid = np.zeros(16, bool)
    valid[:4] = True
    est = estimate_pose_ransac_jax(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(valid), jax.random.PRNGKey(0))
    assert not bool(est.ok)


def test_ransac_batched_vmap():
    pairs = [_synth_pair(n=120, n_outliers=20, noise=0.2, seed=s)
             for s in (7, 8, 9)]
    p0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    p1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    K = jnp.asarray(np.stack([p[2] for p in pairs]))
    valid = jnp.ones((3, 120), bool)
    rngs = jax.random.split(jax.random.PRNGKey(3), 3)
    est = jax.vmap(lambda a, b, k, v, r: estimate_pose_ransac_jax(
        a, b, k, k, v, r, pixel_thr=1.0))(p0, p1, K, valid, rngs)
    for i, (_, _, _, T, _) in enumerate(pairs):
        t_err, r_err = relative_pose_error(
            T, np.asarray(est.R[i]), np.asarray(est.t[i]))
        assert r_err < 1.5 and t_err < 5.0
