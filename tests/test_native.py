"""Native C++ pose solver: build, synthetic-geometry accuracy, cross-check
against OpenCV and the JAX solver."""
import numpy as np
import pytest

from loftr_tpu.native import estimate_pose_native, native_available
from loftr_tpu.eval.metrics import relative_pose_error

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native build failed")


def _synth(n=200, n_out=40, noise=0.2, seed=0):
    import jax.numpy as jnp
    from loftr_tpu.sfm.lie import exp_so3
    rng = np.random.RandomState(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    R = np.asarray(exp_so3(jnp.asarray((rng.randn(3) * 0.1)[None])))[0]
    t = rng.randn(3)
    t /= np.linalg.norm(t)
    pts = rng.rand(n, 3) * [4, 3, 4] + [-2, -1.5, 4]
    p0 = pts @ K.T
    p0 = p0[:, :2] / p0[:, 2:]
    p1 = (pts @ R.T + t) @ K.T
    p1 = p1[:, :2] / p1[:, 2:]
    p0 += rng.randn(n, 2) * noise
    p1 += rng.randn(n, 2) * noise
    out_idx = rng.choice(n, n_out, replace=False)
    p1[out_idx] = rng.rand(n_out, 2) * [640, 480]
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return p0.astype(np.float32), p1.astype(np.float32), K, T, out_idx


def test_native_recovers_pose():
    p0, p1, K, T, out_idx = _synth(seed=0)
    ret = estimate_pose_native(p0, p1, K, K, pixel_thr=1.0)
    assert ret is not None
    R, t, mask = ret
    t_err, r_err = relative_pose_error(T, R, t)
    assert r_err < 1.0 and t_err < 5.0, (r_err, t_err)
    assert mask[out_idx].sum() <= 4  # outliers excluded
    assert mask.sum() > 100


def test_native_agrees_with_opencv():
    from loftr_tpu.eval.pose import estimate_pose_opencv
    p0, p1, K, T, _ = _synth(n=150, n_out=30, noise=0.3, seed=2)
    got = estimate_pose_native(p0, p1, K, K, pixel_thr=1.0)
    ref = estimate_pose_opencv(p0.astype(np.float64), p1.astype(np.float64),
                               K, K, thresh=1.0)
    assert got is not None and ref is not None
    # both must land near GT; compare each to GT rather than to each other
    t_err_n, r_err_n = relative_pose_error(T, got[0], got[1])
    t_err_o, r_err_o = relative_pose_error(T, ref[0], ref[1])
    assert r_err_n < 1.5 and t_err_n < 6.0
    assert abs(r_err_n - r_err_o) < 1.5
    assert abs(t_err_n - t_err_o) < 6.0


def test_native_agrees_with_jax_solver():
    import jax
    import jax.numpy as jnp
    from loftr_tpu.eval.ransac import estimate_pose_ransac_jax
    p0, p1, K, T, _ = _synth(n=120, n_out=20, noise=0.2, seed=3)
    got = estimate_pose_native(p0, p1, K, K, pixel_thr=1.0)
    est = estimate_pose_ransac_jax(
        jnp.asarray(p0), jnp.asarray(p1),
        jnp.asarray(K, jnp.float32), jnp.asarray(K, jnp.float32),
        jnp.ones(len(p0), bool), jax.random.PRNGKey(0), pixel_thr=1.0)
    t_n, r_n = relative_pose_error(T, got[0], got[1])
    t_j, r_j = relative_pose_error(T, np.asarray(est.R), np.asarray(est.t))
    assert r_n < 1.5 and r_j < 1.5
    assert t_n < 6.0 and t_j < 6.0


def test_native_too_few_matches():
    p0 = np.zeros((5, 2), np.float32)
    p1 = np.zeros((5, 2), np.float32)
    K = np.eye(3) * 100
    assert estimate_pose_native(p0, p1, K, K) is None
