"""5-point minimal solver tests: exactness on minimal noise-free samples,
RANSAC pose recovery, cross-check vs OpenCV's 5-point."""
import numpy as np
import pytest

from loftr_tpu.eval.five_point import solve_5point, estimate_pose_5pt
from loftr_tpu.eval.metrics import relative_pose_error


def _minimal_case(seed=0, n=5):
    import jax.numpy as jnp
    from loftr_tpu.sfm.lie import exp_so3
    rng = np.random.RandomState(seed)
    R = np.asarray(exp_so3(jnp.asarray((rng.randn(3) * 0.2)[None])))[0]
    t = rng.randn(3)
    t /= np.linalg.norm(t)
    pts = rng.rand(n, 3) * [2, 2, 2] + [-1, -1, 3]
    p0 = pts[:, :2] / pts[:, 2:]
    pc1 = pts @ R.T + t
    p1 = pc1[:, :2] / pc1[:, 2:]
    Tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = Tx @ R
    E_gt /= np.linalg.norm(E_gt)
    return p0, p1, E_gt, R, t


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_minimal_recovers_gt_essential(seed):
    p0, p1, E_gt, _, _ = _minimal_case(seed)
    sols = solve_5point(p0, p1)
    assert len(sols) >= 1
    # one solution must match E_gt up to sign
    errs = [min(np.linalg.norm(E - E_gt), np.linalg.norm(E + E_gt))
            for E in sols]
    assert min(errs) < 1e-6, (min(errs), len(sols))
    # every returned E satisfies the epipolar constraint on the sample
    for E in sols:
        p0h = np.concatenate([p0, np.ones((5, 1))], 1)
        p1h = np.concatenate([p1, np.ones((5, 1))], 1)
        resid = np.abs(np.sum(p1h * (p0h @ E.T), axis=1))
        assert resid.max() < 1e-6


def _full_case(seed, n=150, n_out=30, noise=0.3):
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
    return p0, p1, K, T, out_idx


def test_ransac_5pt_recovers_pose():
    p0, p1, K, T, out_idx = _full_case(seed=1)
    ret = estimate_pose_5pt(p0, p1, K, K, pixel_thr=1.0,
                            num_hypotheses=100)
    assert ret is not None
    R, t, inl = ret
    t_err, r_err = relative_pose_error(T, R, t)
    assert r_err < 1.0 and t_err < 5.0, (r_err, t_err)
    assert inl[out_idx].sum() <= 4


def test_5pt_agrees_with_opencv_minimal():
    """cv2.findEssentialMat on exactly 5 points runs the same minimal
    problem; solution sets must intersect."""
    import cv2
    p0, p1, E_gt, _, _ = _minimal_case(seed=7)
    ours = solve_5point(p0, p1)
    E_cv, _ = cv2.findEssentialMat(p0, p1, np.eye(3), method=cv2.RANSAC,
                                   threshold=1e-3)
    assert E_cv is not None
    cv_sols = [E_cv[i:i + 3] / np.linalg.norm(E_cv[i:i + 3])
               for i in range(0, len(E_cv), 3)]
    for E_c in cv_sols:
        errs = [min(np.linalg.norm(E - E_c), np.linalg.norm(E + E_c))
                for E in ours]
        if min(errs) < 1e-4:
            return
    raise AssertionError("no overlap between our and OpenCV solution sets")


# ---------------------------------------------------------------------------
# TPU (on-device) 5-point solver: eval/five_point_tpu.py
# ---------------------------------------------------------------------------

def _synth5(seed):
    r = np.random.RandomState(seed)
    aa = r.randn(3) * 0.3
    angle = np.linalg.norm(aa)
    axis = aa / angle
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
    t = r.randn(3)
    t /= np.linalg.norm(t)
    X = r.rand(5, 3) * [4, 3, 2] + [-2, -1.5, 6]
    p0 = X[:, :2] / X[:, 2:]
    Xc = (R @ X.T).T + t
    p1 = Xc[:, :2] / Xc[:, 2:]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    return p0, p1, E_gt / np.linalg.norm(E_gt)


@pytest.mark.heavy
def test_tpu_5point_recovers_gt_essential():
    """Batched on-device solver finds the GT essential matrix (up to sign)
    among its root candidates, across many random geometries including
    twisted-pair root configurations."""
    import jax.numpy as jnp
    from loftr_tpu.eval.five_point_tpu import solve_5point_batched
    B = 48
    tripes = [_synth5(s) for s in range(B)]
    p0 = jnp.asarray(np.stack([t[0] for t in tripes]), jnp.float32)
    p1 = jnp.asarray(np.stack([t[1] for t in tripes]), jnp.float32)
    E_out, valid = solve_5point_batched(p0, p1)
    E_out = np.asarray(E_out)
    valid = np.asarray(valid)
    fails = 0
    for i, (_, _, E_gt) in enumerate(tripes):
        errs = [min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
                for E, ok in zip(E_out[i], valid[i]) if ok]
        if not errs or min(errs) > 1e-3:
            fails += 1
    # f32 root isolation may lose an occasional near-degenerate twisted
    # pair; RANSAC redundancy absorbs that.  Alg-correctness bound:
    assert fails <= 2, f"{fails}/{B} geometries missed the GT solution"


@pytest.mark.heavy
def test_tpu_5point_solutions_satisfy_epipolar():
    """Every returned E annihilates all 5 correspondences and sits on the
    essential manifold (det E = 0, 2 E E^T E - tr E)."""
    import jax.numpy as jnp
    from loftr_tpu.eval.five_point_tpu import solve_5point_batched
    p0, p1, _ = _synth5(3)
    E_out, valid = solve_5point_batched(
        jnp.asarray(p0[None], jnp.float32), jnp.asarray(p1[None], jnp.float32))
    E_out, valid = np.asarray(E_out[0]), np.asarray(valid[0])
    assert valid.any()
    p0h = np.concatenate([p0, np.ones((5, 1))], 1)
    p1h = np.concatenate([p1, np.ones((5, 1))], 1)
    for E, ok in zip(E_out, valid):
        if not ok:
            continue
        resid = np.abs(np.einsum("ni,ij,nj->n", p1h, E, p0h)).max()
        assert resid < 1e-4, resid
        assert abs(np.linalg.det(E)) < 1e-4
        EEt = E @ E.T
        M = 2 * EEt @ E - np.trace(EEt) * E
        assert np.abs(M).max() < 1e-3


@pytest.mark.heavy
def test_ransac_5pt_solver_recovers_pose():
    """RANSAC with on-device minimal 5-point hypotheses under heavy
    outliers."""
    import jax
    import jax.numpy as jnp
    from loftr_tpu.eval.ransac import estimate_pose_ransac_jax
    from loftr_tpu.eval.metrics import relative_pose_error
    from test_ransac import _synth_pair
    p0, p1, K, T, out_idx = _synth_pair(n=150, n_outliers=60, noise=0.2,
                                        seed=3)
    est = estimate_pose_ransac_jax(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(K), jnp.asarray(K),
        jnp.ones(len(p0), bool), jax.random.PRNGKey(1), pixel_thr=1.0,
        num_hypotheses=64, solver="5pt")
    assert bool(est.ok)
    inl = np.asarray(est.inliers)
    assert inl[out_idx].sum() <= 4
    t_err, r_err = relative_pose_error(T, np.asarray(est.R),
                                       np.asarray(est.t))
    assert r_err < 1.5 and t_err < 5.0, (r_err, t_err)
