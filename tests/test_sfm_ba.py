"""Bundle-adjustment tests on synthetic multi-view geometry."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from loftr_tpu.sfm.lie import exp_so3, exp_se3, log_so3, inv_se3
from loftr_tpu.sfm.bundle_adjustment import (BAProblem, bundle_adjust,
                                             reprojection_cost)
from loftr_tpu.sfm.ate import (absolute_trajectory_error, camera_centers)


def test_lie_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(5, 3) * 0.5
    R = np.asarray(exp_so3(jnp.asarray(w)))
    w2 = np.asarray(log_so3(jnp.asarray(R)))
    np.testing.assert_allclose(w, w2, atol=1e-5)
    # exp_se3 inverse property
    xi = rng.randn(4, 6) * 0.3
    T = np.asarray(exp_se3(jnp.asarray(xi)))
    Ti = np.asarray(inv_se3(jnp.asarray(T)))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", T, Ti),
        np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def _synth_ba_problem(C=6, P=120, O=4, noise=0.0, pose_noise=0.0,
                      point_noise=0.0, seed=0):
    """Cameras on an arc looking at a point cloud; each point observed by O
    random cameras."""
    rng = np.random.RandomState(seed)
    pts = rng.rand(P, 3) * [4, 3, 2] + [-2, -1.5, 6]
    R_gt = np.zeros((C, 3, 3))
    t_gt = np.zeros((C, 3))
    for c in range(C):
        angle = (c - C / 2) * 0.08
        w = np.array([0.0, angle, 0.0])
        Rc = np.asarray(exp_so3(jnp.asarray(w[None])))[0]
        center = np.array([c * 0.5 - C * 0.25, 0.1 * rng.randn(), 0.0])
        R_gt[c] = Rc
        t_gt[c] = -Rc @ center

    obs_cam = np.zeros((P, O), np.int32)
    obs_uv = np.zeros((P, O, 2), np.float32)
    obs_w = np.ones((P, O), np.float32)
    for p in range(P):
        cams = rng.choice(C, O, replace=False)
        obs_cam[p] = cams
        for o, c in enumerate(cams):
            Xc = R_gt[c] @ pts[p] + t_gt[c]
            obs_uv[p, o] = Xc[:2] / Xc[2] + rng.randn(2) * noise

    # perturb initial estimates
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    for c in range(1, C):  # keep cam0 exact (gauge)
        dw = rng.randn(3) * pose_noise
        R0[c] = np.asarray(exp_so3(jnp.asarray(dw[None])))[0] @ R_gt[c]
        t0[c] = t_gt[c] + rng.randn(3) * pose_noise
    pts0 = pts + rng.randn(P, 3) * point_noise

    fix = np.zeros(C, bool)
    fix[0] = True
    prob = BAProblem(
        R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32),
        points=jnp.asarray(pts0, jnp.float32),
        obs_uv=jnp.asarray(obs_uv), obs_cam=jnp.asarray(obs_cam),
        obs_w=jnp.asarray(obs_w), fix_mask=jnp.asarray(fix))
    return prob, R_gt, t_gt, pts


def test_ba_zero_residual_at_ground_truth():
    prob, *_ = _synth_ba_problem(noise=0.0, pose_noise=0.0, point_noise=0.0)
    assert float(reprojection_cost(prob)) < 1e-8


def test_ba_converges_from_perturbed_init():
    prob, R_gt, t_gt, pts_gt = _synth_ba_problem(
        noise=0.0, pose_noise=0.02, point_noise=0.05, seed=1)
    cost0 = float(reprojection_cost(prob))
    assert cost0 > 1e-4
    solved, cost = bundle_adjust(prob, max_iters=25)
    assert cost < cost0 * 1e-6, f"cost {cost0} -> {cost}"
    # monocular BA leaves a global-scale gauge freedom even with cam0 fixed
    # (7-DOF gauge); compare after Sim(3) alignment
    centers_est = camera_centers(np.asarray(solved.R), np.asarray(solved.t))
    centers_gt = camera_centers(R_gt, t_gt)
    ate = absolute_trajectory_error(centers_est, centers_gt)
    assert ate["ate_rmse"] < 1e-4, ate
    assert abs(ate["scale"] - 1.0) < 0.05  # scale drift stays small


def test_ba_with_noise_reaches_noise_floor():
    prob, R_gt, t_gt, _ = _synth_ba_problem(
        noise=1e-3, pose_noise=0.01, point_noise=0.03, seed=2)
    solved, cost = bundle_adjust(prob, max_iters=25)
    # cost ~ M * noise^2 (M = P*O*2 residual components)
    M = 120 * 4 * 2
    expected = M * (1e-3) ** 2
    assert cost < expected * 3
    centers_est = camera_centers(np.asarray(solved.R), np.asarray(solved.t))
    centers_gt = camera_centers(R_gt, t_gt)
    ate = absolute_trajectory_error(centers_est, centers_gt)
    # 1e-3 normalized noise (~0.5 px at f=500) over 6 cams / ~3 m baseline:
    # a few-cm ATE is the expected uncertainty, not an optimizer failure
    assert ate["ate_rmse"] < 0.05, ate


def test_ba_respects_padding_weights():
    prob, *_ = _synth_ba_problem(noise=0.0, pose_noise=0.02,
                                 point_noise=0.05, seed=3)
    # corrupt half the observations of point 0 but zero their weight
    obs_uv = np.array(prob.obs_uv)
    obs_w = np.array(prob.obs_w)
    obs_uv[0, 2:] = 1e3
    obs_w[0, 2:] = 0.0
    prob = prob.replace(obs_uv=jnp.asarray(obs_uv),
                        obs_w=jnp.asarray(obs_w))
    solved, cost = bundle_adjust(prob, max_iters=25)
    assert cost < 1e-6  # the garbage observations must not contribute


def test_ate_alignment():
    rng = np.random.RandomState(0)
    gt = rng.rand(10, 3) * 5
    R = np.asarray(exp_so3(jnp.asarray(np.array([[0.1, 0.2, -0.1]]))))[0]
    est = (0.5 * (R.T @ (gt - 1.0).T)).T  # rotated, scaled, shifted
    ate = absolute_trajectory_error(est, gt)
    assert ate["ate_rmse"] < 1e-6
    np.testing.assert_allclose(ate["scale"], 2.0, rtol=1e-5)


@pytest.mark.heavy
def test_sharded_ba_matches_single_device():
    """Point-sharded psum BA == single-device BA (collective correctness)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from loftr_tpu.sfm.bundle_adjustment import (ba_iteration,
                                                 make_sharded_ba_iteration)
    prob, *_ = _synth_ba_problem(C=5, P=64, O=3, noise=1e-3,
                                 pose_noise=0.02, point_noise=0.05, seed=4)
    want_prob, want_old, want_new = ba_iteration(prob, jnp.asarray(1e-4))

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded = prob.replace(
        R=jax.device_put(prob.R, repl), t=jax.device_put(prob.t, repl),
        fix_mask=jax.device_put(prob.fix_mask, repl),
        points=jax.device_put(prob.points, shard),
        obs_uv=jax.device_put(prob.obs_uv, shard),
        obs_cam=jax.device_put(prob.obs_cam, shard),
        obs_w=jax.device_put(prob.obs_w, shard))
    step = make_sharded_ba_iteration(mesh, "data")
    got_prob, got_old, got_new = step(sharded, jnp.asarray(1e-4))

    np.testing.assert_allclose(float(got_old), float(want_old), rtol=1e-5)
    np.testing.assert_allclose(float(got_new), float(want_new), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_prob.t),
                               np.asarray(want_prob.t), rtol=1e-4, atol=1e-6)
    # landmark updates see psum reassociation amplified through the 3x3
    # back-substitution; equivalence is established by the matched new_cost
    np.testing.assert_allclose(np.asarray(got_prob.points),
                               np.asarray(want_prob.points),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.heavy
def test_sharded_ba_full_loop():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from loftr_tpu.sfm.bundle_adjustment import bundle_adjust_sharded
    prob, R_gt, t_gt, _ = _synth_ba_problem(
        C=5, P=64, O=3, noise=0.0, pose_noise=0.02, point_noise=0.05, seed=5)
    cost0 = float(reprojection_cost(prob))
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded = prob.replace(
        R=jax.device_put(prob.R, repl), t=jax.device_put(prob.t, repl),
        fix_mask=jax.device_put(prob.fix_mask, repl),
        points=jax.device_put(prob.points, shard),
        obs_uv=jax.device_put(prob.obs_uv, shard),
        obs_cam=jax.device_put(prob.obs_cam, shard),
        obs_w=jax.device_put(prob.obs_w, shard))
    solved, cost = bundle_adjust_sharded(sharded, mesh, max_iters=15)
    assert cost < cost0 * 1e-6


def test_huber_ba_resists_gross_outliers():
    """Plant gross outlier observations with weight 1: Huber BA stays near
    GT while plain L2 BA is dragged off."""
    prob, R_gt, t_gt, _ = _synth_ba_problem(
        C=6, P=120, O=4, noise=1e-4, pose_noise=0.01, point_noise=0.02,
        seed=7)
    obs_uv = np.array(prob.obs_uv)
    rngo = np.random.RandomState(7)
    for p in rngo.choice(120, 15, replace=False):  # corrupt 15 observations
        obs_uv[p, 0] += rngo.randn(2) * 0.3  # huge (0.3 normalized ~ 150px)
    prob = prob.replace(obs_uv=jnp.asarray(obs_uv))

    l2_solved, _ = bundle_adjust(prob, max_iters=20)
    # annealed robust schedule: Huber to find the basin, then the
    # redescending Tukey kernel to fully reject the gross outliers
    # (delta in normalized units; 0.002 ~ 1px at f=500)
    rob = prob
    rob, _ = bundle_adjust(rob, max_iters=10, huber_delta=0.02)
    rob, _ = bundle_adjust(rob, max_iters=10, huber_delta=0.005)
    rob, _ = bundle_adjust(rob, max_iters=15, huber_delta=0.002,
                           kernel="tukey")

    gt_centers = camera_centers(R_gt, t_gt)
    ate_l2 = absolute_trajectory_error(
        camera_centers(np.asarray(l2_solved.R), np.asarray(l2_solved.t)),
        gt_centers)
    ate_rob = absolute_trajectory_error(
        camera_centers(np.asarray(rob.R), np.asarray(rob.t)), gt_centers)
    assert ate_rob["ate_rmse"] < 0.02, ate_rob
    assert ate_rob["ate_rmse"] < ate_l2["ate_rmse"] / 10, (ate_rob, ate_l2)


def test_pcg_solver_matches_dense():
    """Matrix-free PCG step == dense Schur step (same damping, same gauge)."""
    from loftr_tpu.sfm.bundle_adjustment import ba_iteration
    prob, *_ = _synth_ba_problem(C=8, P=160, O=4, noise=1e-3,
                                 pose_noise=0.02, point_noise=0.05, seed=11)
    want_prob, _, want_new = ba_iteration(prob, jnp.asarray(1e-4),
                                          solver="dense")
    got_prob, _, got_new = ba_iteration(prob, jnp.asarray(1e-4),
                                        solver="pcg", cg_iters=200)
    np.testing.assert_allclose(np.asarray(got_prob.t),
                               np.asarray(want_prob.t), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(got_new), float(want_new), rtol=1e-3)


def test_pcg_full_loop_converges():
    prob, R_gt, t_gt, _ = _synth_ba_problem(
        noise=0.0, pose_noise=0.02, point_noise=0.05, seed=12)
    cost0 = float(reprojection_cost(prob))
    solved, cost = bundle_adjust(prob, max_iters=25, solver="pcg")
    assert cost < cost0 * 1e-6, f"cost {cost0} -> {cost}"
    centers_est = camera_centers(np.asarray(solved.R), np.asarray(solved.t))
    centers_gt = camera_centers(R_gt, t_gt)
    ate = absolute_trajectory_error(centers_est, centers_gt)
    assert ate["ate_rmse"] < 1e-3, ate


@pytest.mark.heavy
def test_sharded_pcg_matches_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from loftr_tpu.sfm.bundle_adjustment import (ba_iteration,
                                                 make_sharded_ba_iteration)
    prob, *_ = _synth_ba_problem(C=5, P=64, O=3, noise=1e-3,
                                 pose_noise=0.02, point_noise=0.05, seed=13)
    want_prob, want_old, want_new = ba_iteration(prob, jnp.asarray(1e-4),
                                                 solver="pcg", cg_iters=200)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded = prob.replace(
        R=jax.device_put(prob.R, repl), t=jax.device_put(prob.t, repl),
        fix_mask=jax.device_put(prob.fix_mask, repl),
        points=jax.device_put(prob.points, shard),
        obs_uv=jax.device_put(prob.obs_uv, shard),
        obs_cam=jax.device_put(prob.obs_cam, shard),
        obs_w=jax.device_put(prob.obs_w, shard))
    step = make_sharded_ba_iteration(mesh, "data", solver="pcg",
                                     cg_iters=200)
    got_prob, got_old, got_new = step(sharded, jnp.asarray(1e-4))
    np.testing.assert_allclose(float(got_old), float(want_old), rtol=1e-5)
    np.testing.assert_allclose(float(got_new), float(want_new), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_prob.t),
                               np.asarray(want_prob.t), rtol=1e-3, atol=1e-5)


def test_reset_point_outliers_recovers_dragged_points():
    """A gross outlier observation drags its point during L2/Huber BA; the
    redescending Tukey stage then sees the point's GOOD observations as
    outliers.  reset_point_outliers retriangulates from gated inliers and
    zeroes the bad observation, letting Tukey finish at the noise floor."""
    from loftr_tpu.sfm.bundle_adjustment import reset_point_outliers
    prob, R_gt, t_gt, pts_gt = _synth_ba_problem(
        C=6, P=120, O=4, noise=1e-4, pose_noise=0.0, point_noise=0.0,
        seed=21)
    obs_uv = np.array(prob.obs_uv)
    pts0 = np.array(prob.points)
    rngo = np.random.RandomState(21)
    bad = rngo.choice(120, 20, replace=False)
    for p in bad:
        obs_uv[p, 0] += rngo.randn(2) * 0.25      # gross outlier, weight 1
        # the point already sits dragged toward the outlier's consensus
        pts0[p] += rngo.randn(3) * 0.5
    prob = prob.replace(obs_uv=jnp.asarray(obs_uv),
                        points=jnp.asarray(pts0, jnp.float32))

    fixed = reset_point_outliers(prob, 0.005)
    w = np.asarray(fixed.obs_w)
    # every planted outlier observation is hard-zeroed...
    assert (w[bad, 0] == 0.0).all()
    # ...and no clean observation of an undragged point was lost
    clean = np.setdiff1d(np.arange(120), bad)
    assert (w[clean] > 0).all()
    # dragged points land back near ground truth (cameras were exact);
    # the Tukey stage below does the final polish
    err = np.linalg.norm(np.asarray(fixed.points)[bad] - pts_gt[bad], axis=1)
    assert err.max() < 0.02, err.max()

    # end-to-end: tukey WITHOUT reset leaves dragged points stuck (its
    # basin is the corrupted position); with reset it reaches the floor
    tk_only, _ = bundle_adjust(prob, max_iters=15, huber_delta=0.002,
                               kernel="tukey")
    tk_reset, _ = bundle_adjust(fixed, max_iters=15, huber_delta=0.002,
                                kernel="tukey")
    e_only = np.linalg.norm(np.asarray(tk_only.points)[bad] - pts_gt[bad],
                            axis=1).max()
    e_reset = np.linalg.norm(np.asarray(tk_reset.points)[bad] - pts_gt[bad],
                             axis=1).max()
    # absolute bound reflects 3-observation triangulation uncertainty after
    # the outlier observation is dropped; relative bound is the real claim
    assert e_reset < 0.03, e_reset
    assert e_reset < e_only / 20, (e_reset, e_only)
