"""Bundle adjustment with an explicit Schur complement, batched for TPU.

New scope (BASELINE.json north star; no reference counterpart - the
reference's eval stops at per-pair RANSAC poses, metrics.py:72-98).

Design for TPU:
  - static shapes everywhere: observations are grouped BY POINT into a
    [P, O] table (O = max observations per point; zero-weight padding), so
    the camera-camera Schur fill is a per-point dense O x O block outer
    product scattered with index_add - no dynamic sparsity;
  - the reduced camera system S [6C, 6C] is small (C = keyframes) and solved
    densely on the MXU; landmark updates back-substitute in closed form
    (3x3 inverses);
  - Levenberg-Marquardt outer loop on the host, one jitted device program
    per iteration;
  - distribution: shard the point axis; every partial (S, b) is formed
    locally and psum-reduced over the mesh axis, the solve is replicated,
    landmark back-substitution stays local (see
    :func:`bundle_adjust_sharded`).

Conventions: pose = world->camera (R, t); observation uv is in NORMALIZED
camera coordinates (pixels pre-multiplied by K^-1); pose increments are
left-multiplied se3 perturbations.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from loftr_tpu.sfm.lie import exp_se3, hat


@flax.struct.dataclass
class BAProblem:
    R: jax.Array        # [C, 3, 3] world->cam rotations
    t: jax.Array        # [C, 3]
    points: jax.Array   # [P, 3]
    obs_uv: jax.Array   # [P, O, 2] normalized coords
    obs_cam: jax.Array  # [P, O] int32 camera index (0 for padding)
    obs_w: jax.Array    # [P, O] weight, 0 for padding
    fix_mask: jax.Array  # [C] bool: gauge-fixed cameras (no update)

    @property
    def n_cams(self):
        return self.R.shape[0]


def _project(R, t, X):
    """Xc = R X + t; returns (pred [2], Xc [3])."""
    Xc = (R @ X[..., None])[..., 0] + t
    z = jnp.maximum(Xc[..., 2:3], 1e-6)
    return Xc[..., :2] / z, Xc


def reprojection_cost(prob: BAProblem, huber_delta: float = 0.0,
                      kernel: str = "huber") -> jax.Array:
    """Weighted reprojection cost: squared error, or the Huber objective
    when huber_delta > 0 (the LM loop must optimize the same objective the
    IRLS weights linearize)."""
    R = prob.R[prob.obs_cam]          # [P, O, 3, 3]
    t = prob.t[prob.obs_cam]          # [P, O, 3]
    pred, _ = _project(R, t, prob.points[:, None, :])
    r = (pred - prob.obs_uv) * prob.obs_w[..., None]
    r2 = jnp.sum(r ** 2, axis=-1)     # [P, O]
    if huber_delta > 0:
        rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
        if kernel == "tukey":
            c2 = huber_delta ** 2
            u2 = jnp.clip(r2 / c2, 0.0, 1.0)
            return jnp.sum(c2 / 6 * (1 - (1 - u2) ** 3)) * 6
        return jnp.sum(jnp.where(
            rn <= huber_delta, r2,
            2 * huber_delta * rn - huber_delta ** 2))
    return jnp.sum(r2)


def _huber_weight(r2: jax.Array, delta: float) -> jax.Array:
    """IRLS weight sqrt(w) for the Huber kernel on squared residual r2."""
    rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
    return jnp.sqrt(jnp.where(rn <= delta, 1.0, delta / rn))


def _tukey_weight(r2: jax.Array, c: float) -> jax.Array:
    """IRLS weight sqrt(w) for the Tukey biweight (redescending: residuals
    beyond c are fully rejected)."""
    rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
    u = jnp.clip(rn / c, 0.0, 1.0)
    return (1.0 - u ** 2)  # sqrt of (1-u^2)^2


def _linearize(prob: BAProblem, huber_delta: float = 0.0,
               kernel: str = "huber"):
    """Per-observation residuals + Jacobians.

    huber_delta > 0 applies IRLS robust downweighting on the
    per-observation residual norm (normalized-coordinate units);
    kernel: 'huber' (bounded influence) or 'tukey' (redescending -
    residuals beyond the scale are fully rejected).
    Returns r [P,O,2], J_c [P,O,2,6], J_p [P,O,2,3].
    """
    R = prob.R[prob.obs_cam]
    t = prob.t[prob.obs_cam]
    pred, Xc = _project(R, t, prob.points[:, None, :])
    w = prob.obs_w[..., None]
    if huber_delta > 0:
        r_plain = (pred - prob.obs_uv) * w
        r2 = jnp.sum(r_plain ** 2, axis=-1, keepdims=True)
        fn = _tukey_weight if kernel == "tukey" else _huber_weight
        w = w * fn(r2, huber_delta)
    r = (pred - prob.obs_uv) * w

    z = jnp.maximum(Xc[..., 2], 1e-6)
    x, y = Xc[..., 0], Xc[..., 1]
    zero = jnp.zeros_like(z)
    inv_z = 1.0 / z
    # d(pred)/d(Xc): [P, O, 2, 3]
    P_mat = jnp.stack([
        jnp.stack([inv_z, zero, -x * inv_z ** 2], -1),
        jnp.stack([zero, inv_z, -y * inv_z ** 2], -1),
    ], axis=-2)
    # d(Xc)/d(xi) for left-perturbation exp(xi) (R, t): [-hat(Xc) | I]
    dxc_dxi = jnp.concatenate([
        -hat(Xc), jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype),
                                   Xc.shape[:-1] + (3, 3))], axis=-1)
    J_c = (P_mat @ dxc_dxi) * w[..., None]          # [P, O, 2, 6]
    J_p = (P_mat @ R) * w[..., None]                # [P, O, 2, 3]
    return r, J_c, J_p


def _build_normal_terms(prob: BAProblem, lm_lambda, huber_delta=0.0,
                        kernel="huber"):
    """All per-point/per-camera normal-equation pieces."""
    r, J_c, J_p = _linearize(prob, huber_delta, kernel)
    C = prob.n_cams

    # camera blocks
    Hcc_blocks = jnp.einsum("poia,poib->poab", J_c, J_c)   # [P, O, 6, 6]
    b_c_obs = -jnp.einsum("poia,poi->poa", J_c, r)         # [P, O, 6]
    cam = prob.obs_cam.reshape(-1)
    Hcc = jnp.zeros((C, 6, 6)).at[cam].add(
        Hcc_blocks.reshape(-1, 6, 6))
    b_c = jnp.zeros((C, 6)).at[cam].add(b_c_obs.reshape(-1, 6))

    # point blocks
    Hpp = jnp.einsum("poia,poib->pab", J_p, J_p)           # [P, 3, 3]
    b_p = -jnp.einsum("poia,poi->pa", J_p, r)              # [P, 3]
    Hpp = Hpp + lm_lambda * jnp.eye(3) * \
        jnp.maximum(jnp.trace(Hpp, axis1=1, axis2=2)[:, None, None] / 3,
                    1e-8)
    Hpp_inv = jnp.linalg.inv(Hpp + 1e-9 * jnp.eye(3))

    # cross blocks per observation (unique (cam, point) per obs)
    A = jnp.einsum("poia,poib->poab", J_c, J_p)            # [P, O, 6, 3]
    return r, Hcc, b_c, Hpp_inv, b_p, A


def _schur_reduce(prob: BAProblem, Hcc, b_c, Hpp_inv, b_p, A, lm_lambda):
    """Form the reduced camera system S, rhs."""
    C = prob.n_cams
    O = prob.obs_cam.shape[1]
    G = jnp.einsum("poab,pbc->poac", A, Hpp_inv)           # [P, O, 6, 3]

    # S -= sum_p sum_{o1,o2} G[p,o1] A[p,o2]^T at block (cam_o1, cam_o2)
    pair_blocks = jnp.einsum("poac,pqbc->poqab", G, A)     # [P, O, O, 6, 6]
    cam_i = jnp.repeat(prob.obs_cam[:, :, None], O, axis=2).reshape(-1)
    cam_j = jnp.repeat(prob.obs_cam[:, None, :], O, axis=1).reshape(-1)
    S = jnp.zeros((C, C, 6, 6))
    S = S.at[cam_i, cam_j].add(-pair_blocks.reshape(-1, 6, 6))
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)

    # rhs: b_c - sum_obs G b_p[point]
    gb = jnp.einsum("poac,pc->poa", G, b_p)                # [P, O, 6]
    rhs = b_c - jnp.zeros((C, 6)).at[prob.obs_cam.reshape(-1)].add(
        gb.reshape(-1, 6))

    # LM damping on camera blocks
    diag_scale = jnp.maximum(
        jnp.trace(Hcc, axis1=1, axis2=2)[:, None, None] / 6, 1e-8)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        lm_lambda * jnp.eye(6) * diag_scale)
    return S, rhs


# ---------------------------------------------------------------------------
# Matrix-free PCG on the reduced camera system.
#
# The dense path (_schur_reduce) materializes [P, O, O, 6, 6] pair blocks and
# a [6C, 6C] matrix - O(P*O^2) work / memory, fine for keyframe-scale maps
# but the scaling wall for large C or dense tracks (NOTES.md gap).  The PCG
# path never forms S: each CG iteration applies
#     S v = (Hcc + lambda D) v - sum_obs A_po Hpp_inv_p A_po^T v[cam_po]
# with O(P*O) gathers/scatters, preconditioned by the exact 6x6 diagonal
# blocks of S (exact because each point sees a camera at most once - the
# observation table is grouped by point with distinct cameras per row;
# padding rows have A == 0 and contribute nothing).
# ---------------------------------------------------------------------------

def _schur_matvec(obs_cam, Hcc_damped, Hpp_inv, A, v, psum_axis=None):
    """Apply the reduced camera matrix S to v [C, 6] without forming S."""
    vc = v[obs_cam]                                    # [P, O, 6]
    u = jnp.einsum("poab,poa->pb", A, vc)              # [P, 3] A^T v
    w = jnp.einsum("pab,pb->pa", Hpp_inv, u)           # [P, 3]
    Aw = jnp.einsum("poab,pb->poa", A, w)              # [P, O, 6]
    out = -jnp.zeros_like(v).at[obs_cam.reshape(-1)].add(Aw.reshape(-1, 6))
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    return out + jnp.einsum("cab,cb->ca", Hcc_damped, v)


def _schur_diag_blocks(obs_cam, Hcc_damped, Hpp_inv, A, psum_axis=None):
    """Exact 6x6 diagonal blocks of S (see module comment for why the
    per-observation sum is exact)."""
    G = jnp.einsum("poab,pbc->poac", A, Hpp_inv)       # [P, O, 6, 3]
    d = jnp.einsum("poac,pobc->poab", G, A)            # [P, O, 6, 6]
    C = Hcc_damped.shape[0]
    corr = jnp.zeros((C, 6, 6), Hcc_damped.dtype).at[
        obs_cam.reshape(-1)].add(d.reshape(-1, 6, 6))
    if psum_axis is not None:
        corr = jax.lax.psum(corr, psum_axis)
    return Hcc_damped - corr


def _pcg(matvec, Minv_blocks, rhs, active, iters: int, rtol: float):
    """Block-Jacobi preconditioned CG restricted to active cameras.

    active [C] masks out gauge-fixed cameras (their delta stays 0, matching
    _solve_cameras' identity-row treatment).  Runs a fixed-shape
    lax.while_loop capped at `iters` with a relative-residual exit."""
    act = active[:, None].astype(rhs.dtype)
    rhs = rhs * act

    def apply_S(v):
        return matvec(v * act) * act

    def apply_M(v):
        return jnp.einsum("cab,cb->ca", Minv_blocks, v) * act

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = apply_M(r0)
    rz0 = jnp.vdot(r0, z0)
    stop2 = (rtol ** 2) * jnp.maximum(jnp.vdot(rhs, rhs), 1e-30)

    def cond(state):
        _, r, _, _, _, k = state
        return jnp.logical_and(k < iters, jnp.vdot(r, r) > stop2)

    def body(state):
        x, r, z, p, rz, k = state
        Sp = apply_S(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Sp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Sp
        z = apply_M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    x, *_ = jax.lax.while_loop(cond, body,
                               (x0, r0, z0, z0, rz0, jnp.zeros((), jnp.int32)))
    return x


def _solve_cameras_pcg(prob: BAProblem, Hcc, b_c, Hpp_inv, b_p, A, lm_lambda,
                       cg_iters: int = 100, cg_rtol: float = 1e-6,
                       psum_axis=None):
    """Gauge-fixed reduced-system solve via matrix-free PCG.

    Numerically equivalent to _schur_reduce + _solve_cameras (same damping,
    same gauge treatment) but with O(P*O) per-iteration cost and no [C,C] or
    [P,O,O] materialization."""
    C = prob.n_cams
    diag_scale = jnp.maximum(
        jnp.trace(Hcc, axis1=1, axis2=2)[:, None, None] / 6, 1e-8)
    Hcc_damped = Hcc + lm_lambda * jnp.eye(6, dtype=Hcc.dtype) * diag_scale

    G = jnp.einsum("poab,pbc->poac", A, Hpp_inv)
    gb = jnp.einsum("poac,pc->poa", G, b_p)
    rhs_corr = jnp.zeros((C, 6), b_c.dtype).at[
        prob.obs_cam.reshape(-1)].add(gb.reshape(-1, 6))
    if psum_axis is not None:
        rhs_corr = jax.lax.psum(rhs_corr, psum_axis)
    rhs = b_c - rhs_corr

    D = _schur_diag_blocks(prob.obs_cam, Hcc_damped, Hpp_inv, A, psum_axis)
    # fixed cameras: identity block so the inverse is well-posed
    fixed = prob.fix_mask
    eye6 = jnp.eye(6, dtype=D.dtype)
    D = jnp.where(fixed[:, None, None], eye6[None], D + 1e-8 * eye6)
    Minv = jnp.linalg.inv(D)

    matvec = partial(_schur_matvec, prob.obs_cam, Hcc_damped, Hpp_inv, A,
                     psum_axis=psum_axis)
    return _pcg(matvec, Minv, rhs, ~fixed, cg_iters, cg_rtol)


def _solve_cameras(prob: BAProblem, S, rhs):
    """Dense solve of the (gauge-fixed) reduced system."""
    C = prob.n_cams
    # gauge fixing: identity rows/cols for fixed cameras
    fixed = prob.fix_mask
    blockmask = (~fixed[:, None]) & (~fixed[None, :])
    S = jnp.where(blockmask[:, :, None, None], S, 0.0)
    eye_block = jnp.eye(6) * 1.0
    S = S.at[jnp.arange(C), jnp.arange(C)].set(
        jnp.where(fixed[:, None, None], eye_block[None], S[jnp.arange(C),
                                                           jnp.arange(C)]))
    rhs = jnp.where(fixed[:, None], 0.0, rhs)

    Sd = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    delta = jnp.linalg.solve(Sd, rhs.reshape(-1))
    return delta.reshape(C, 6)


def _back_substitute(prob: BAProblem, Hpp_inv, b_p, A, delta_c):
    """Landmark updates: dp = Hpp^-1 (b_p - sum_o A_o^T dc_{cam_o})."""
    dc = delta_c[prob.obs_cam]                       # [P, O, 6]
    At_dc = jnp.einsum("poab,poa->pb", A, dc)
    dp = jnp.einsum("pab,pb->pa", Hpp_inv, b_p - At_dc)
    return dp


def _apply_update(prob: BAProblem, delta_c, delta_p):
    T = exp_se3(delta_c)                             # [C, 4, 4]
    R_new = T[:, :3, :3] @ prob.R
    t_new = (T[:, :3, :3] @ prob.t[..., None])[..., 0] + T[:, :3, 3]
    return prob.replace(R=R_new, t=t_new, points=prob.points + delta_p)


@partial(jax.jit, static_argnames=("huber_delta", "kernel", "solver",
                                   "cg_iters"))
def ba_iteration(prob: BAProblem, lm_lambda, huber_delta: float = 0.0,
                 kernel: str = "huber", solver: str = "dense",
                 cg_iters: int = 100
                 ) -> Tuple[BAProblem, jax.Array, jax.Array]:
    """One damped Gauss-Newton (LM) step (optionally robust).

    solver: 'dense' forms the reduced camera system explicitly (O(P*O^2)
    fill, exact [6C,6C] solve); 'pcg' is matrix-free block-Jacobi PCG
    (O(P*O) per CG iteration, never materializes S - use for large C).
    Returns (candidate problem, old cost, new cost).

    Matmul precision is pinned to 'highest': with the TPU-default bf16
    MXU passes the LM floor measurably rises (v5e, C=8/P=300/noise=1e-3:
    final cost 1.476e-3 unpinned vs 1.398e-3 pinned, noise floor 1.2e-3
    — the gap above floor grows ~1.4x); all blocks are <= 6x6 so the
    3-pass cost is negligible against the solve itself."""
    with jax.default_matmul_precision("highest"):
        r, Hcc, b_c, Hpp_inv, b_p, A = _build_normal_terms(
            prob, lm_lambda, huber_delta, kernel)
        if solver == "pcg":
            delta_c = _solve_cameras_pcg(prob, Hcc, b_c, Hpp_inv, b_p, A,
                                         lm_lambda, cg_iters=cg_iters)
        else:
            S, rhs = _schur_reduce(prob, Hcc, b_c, Hpp_inv, b_p, A,
                                   lm_lambda)
            delta_c = _solve_cameras(prob, S, rhs)
        delta_p = _back_substitute(prob, Hpp_inv, b_p, A, delta_c)
        new_prob = _apply_update(prob, delta_c, delta_p)
        return (new_prob, reprojection_cost(prob, huber_delta, kernel),
                reprojection_cost(new_prob, huber_delta, kernel))


def bundle_adjust(prob: BAProblem, max_iters: int = 20,
                  lm_lambda0: float = 1e-4,
                  tol: float = 1e-10, verbose: bool = False,
                  huber_delta: float = 0.0, kernel: str = "huber",
                  solver: str = "dense", cg_iters: int = 100
                  ) -> Tuple[BAProblem, float]:
    """Host-controlled LM loop; one device program per iteration.

    huber_delta > 0 enables the robust kernel (units: normalized camera
    coords; e.g. 3px at f=500 -> 0.006); kernel 'huber' or 'tukey';
    solver 'dense' or 'pcg' (see ba_iteration)."""
    lam = lm_lambda0
    cost = float(reprojection_cost(prob, huber_delta, kernel))
    for it in range(max_iters):
        cand, old_cost, new_cost = ba_iteration(prob, jnp.asarray(lam),
                                                huber_delta, kernel,
                                                solver, cg_iters)
        new_cost = float(new_cost)
        if verbose:
            print(f"BA iter {it}: cost {cost:.6e} -> {new_cost:.6e} "
                  f"(lambda={lam:.1e})")
        if new_cost < cost:
            prob = cand
            improved = cost - new_cost
            cost = new_cost
            lam = max(lam * 0.3, 1e-9)
            if improved < tol * max(cost, 1.0):
                break
        else:
            lam = min(lam * 10.0, 1e6)
            if lam >= 1e6:
                break
    return prob, cost


# ---------------------------------------------------------------------------
# Per-point outlier-vs-reset stage (between the Huber and Tukey rounds of an
# annealed robust schedule).  The redescending Tukey kernel can permanently
# reject GOOD observations of a point that an early gross outlier dragged
# off: once the point sits at the outlier's consensus, the true observations
# look like the outliers.  The fix is point-local: gate each observation by
# its residual, retriangulate every point from its gated (inlier)
# observations only (cameras held fixed - 3x3 GN solves, trivially batched),
# and zero the weight of observations that still disagree afterwards.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("gn_iters",))
def reset_point_outliers(prob: BAProblem, thr: float,
                         gn_iters: int = 8) -> BAProblem:
    """RANSAC-style per-track consensus: retriangulation + outlier removal.

    For every point, all O(O^2) two-view midpoint triangulations of its
    observation pairs are candidate positions (plus the current position);
    the candidate with maximum observation support (residual < thr) wins,
    is GN-polished on its gated inliers (cameras fixed - batched 3x3
    solves), and observations still beyond the gate afterwards get their
    weight zeroed.  This fixes the case a residual gate alone cannot: a
    point dragged so far by a gross outlier that ALL its residuals exceed
    the gate (the good observations still agree with each other, which the
    two-view candidates expose).

    thr: gate in normalized-coordinate units (same scale as huber_delta;
    e.g. 3px at f=500 -> 0.006).  Points whose best support < 2 are left
    untouched.
    """
    with jax.default_matmul_precision("highest"):
        return _reset_point_outliers_impl(prob, thr, gn_iters)


def _reset_point_outliers_impl(prob, thr, gn_iters):
    R = prob.R[prob.obs_cam]              # [P, O, 3, 3]
    t = prob.t[prob.obs_cam]              # [P, O, 3]
    P, O = prob.obs_cam.shape
    dt = prob.points.dtype
    thr2 = thr * thr
    w_valid = prob.obs_w > 0              # [P, O]

    def residual2(points):
        """points [..., P, 3] -> squared residual [..., P, O]."""
        pred, _ = _project(R, t, points[..., None, :])
        return jnp.sum((pred - prob.obs_uv) ** 2, axis=-1)

    # two-view midpoint triangulation for every observation pair:
    # rays  X = c_o + s * d_o  in world coords
    Rt = jnp.swapaxes(R, -1, -2)
    centers = -(Rt @ t[..., None])[..., 0]                     # [P, O, 3]
    ray = jnp.concatenate([prob.obs_uv,
                           jnp.ones((P, O, 1), dt)], -1)       # cam coords
    dirs = (Rt @ ray[..., None])[..., 0]                       # [P, O, 3]
    d1 = dirs[:, :, None, :]                                   # [P, O, O, 3]
    d2 = dirs[:, None, :, :]
    c1 = centers[:, :, None, :]
    c2 = centers[:, None, :, :]
    a11 = jnp.sum(d1 * d1, -1)
    a12 = -jnp.sum(d1 * d2, -1)
    a22 = jnp.sum(d2 * d2, -1)
    dc = c2 - c1
    b1 = jnp.sum(d1 * dc, -1)
    b2 = -jnp.sum(d2 * dc, -1)
    det = a11 * a22 - a12 * a12
    degen = jnp.abs(det) < 1e-12                               # parallel rays
    det = jnp.where(degen, 1.0, det)
    s1 = (b1 * a22 - b2 * a12) / det
    s2 = (a11 * b2 - a12 * b1) / det
    cand = 0.5 * ((c1 + s1[..., None] * d1) + (c2 + s2[..., None] * d2))
    pair_ok = (w_valid[:, :, None] & w_valid[:, None, :] & ~degen &
               (jnp.arange(O)[:, None] < jnp.arange(O)[None, :])[None] &
               (s1 > 0) & (s2 > 0))                            # [P, O, O]

    # support of each candidate (and of the current position)
    A = O * O
    cand_flat = cand.reshape(P, A, 3)
    r2_cand = residual2(jnp.swapaxes(cand_flat, 0, 1))         # [A, P, O]
    supp = jnp.sum((r2_cand < thr2) & w_valid[None], axis=-1)  # [A, P]
    supp = jnp.where(pair_ok.reshape(P, A).T, supp, 0)
    supp_cur = jnp.sum((residual2(prob.points) < thr2) & w_valid, axis=-1)

    best = jnp.argmax(supp, axis=0)                            # [P]
    best_supp = jnp.take_along_axis(supp, best[None], axis=0)[0]
    # switch to the consensus candidate only if it strictly beats the
    # current position's support (ties keep the smooth BA estimate)
    switch = (best_supp >= 2) & (best_supp > supp_cur)
    X0 = jnp.where(switch[:, None],
                   jnp.take_along_axis(cand_flat, best[:, None, None],
                                       axis=1)[:, 0], prob.points)

    gate = (residual2(X0) < thr2) & w_valid                    # [P, O]
    can_fix = jnp.sum(gate, axis=1) >= 2
    gate_w = (gate & can_fix[:, None]).astype(dt)

    def gn_body(_, points):
        pred, Xc = _project(R, t, points[:, None, :])
        r = (pred - prob.obs_uv) * gate_w[..., None]           # [P, O, 2]
        z = jnp.maximum(Xc[..., 2], 1e-6)
        x, y = Xc[..., 0], Xc[..., 1]
        zero = jnp.zeros_like(z)
        inv_z = 1.0 / z
        P_mat = jnp.stack([
            jnp.stack([inv_z, zero, -x * inv_z ** 2], -1),
            jnp.stack([zero, inv_z, -y * inv_z ** 2], -1),
        ], axis=-2)                                            # [P, O, 2, 3]
        J = (P_mat @ R) * gate_w[..., None, None]
        H = jnp.einsum("poia,poib->pab", J, J)
        b = -jnp.einsum("poia,poi->pa", J, r)
        H = H + 1e-8 * jnp.eye(3, dtype=H.dtype)
        dp = jnp.linalg.solve(H, b[..., None])[..., 0]
        return points + jnp.where(can_fix[:, None], dp, 0.0)

    points = jax.lax.fori_loop(0, gn_iters, gn_body, X0)
    points = jnp.where(can_fix[:, None], points, prob.points)

    # hard-zero observations that still disagree with the re-solved point
    still_out = (residual2(points) >= thr2) & can_fix[:, None]
    new_w = jnp.where(still_out, 0.0, prob.obs_w)
    return prob.replace(points=points, obs_w=new_w)


# ---------------------------------------------------------------------------
# Distributed BA: points (and their observations) sharded across a mesh axis;
# the reduced camera system is formed with psum collectives over ICI/DCN and
# solved replicated; landmark back-substitution stays shard-local.
# (SURVEY.md §7 stage 8 / BASELINE.json north star.)
# ---------------------------------------------------------------------------

def make_sharded_ba_iteration(mesh, axis: str = "data",
                              solver: str = "dense", cg_iters: int = 100):
    """Build a shard_map'd BA iteration over a point-sharded BAProblem.

    The returned fn takes (prob, lm_lambda) where prob.points/obs_* are
    sharded on `axis` (camera state replicated) and returns
    (new_prob, old_cost, new_cost) with the same shardings.

    solver 'dense': each shard fills its partial [C,C,6,6] S, one psum, a
    replicated dense solve.  solver 'pcg': matrix-free - one psum per CG
    matvec, nothing quadratic in C ever formed; the right choice once C or
    track density makes the dense fill the bottleneck.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    prob_spec = BAProblem(
        R=P(), t=P(), points=P(axis),
        obs_uv=P(axis), obs_cam=P(axis), obs_w=P(axis), fix_mask=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(prob_spec, P()),
             out_specs=(prob_spec, P(), P()))
    def step(prob, lm_lambda):
        # same 'highest' precision pin as ba_iteration (the bf16 MXU default
        # measurably raises the LM floor on real TPU; see ba_iteration)
        with jax.default_matmul_precision("highest"):
            return _step_body(prob, lm_lambda)

    def _step_body(prob, lm_lambda):
        r, Hcc_l, b_c_l, Hpp_inv, b_p, A = _build_normal_terms(
            prob, lm_lambda)
        # NB: damping must see the GLOBAL Hcc; psum partial sums first.
        Hcc = jax.lax.psum(Hcc_l, axis)
        b_c = jax.lax.psum(b_c_l, axis)
        if solver == "pcg":
            delta_c = _solve_cameras_pcg(prob, Hcc, b_c, Hpp_inv, b_p, A,
                                         lm_lambda, cg_iters=cg_iters,
                                         psum_axis=axis)
        else:
            S_l, rhs_l = _schur_reduce(prob, jnp.zeros_like(Hcc),
                                       jnp.zeros_like(b_c), Hpp_inv, b_p, A,
                                       0.0)
            S = jax.lax.psum(S_l, axis)
            rhs = jax.lax.psum(rhs_l, axis) + b_c
            C = prob.n_cams
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
            diag_scale = jnp.maximum(
                jnp.trace(Hcc, axis1=1, axis2=2)[:, None, None] / 6, 1e-8)
            S = S.at[jnp.arange(C), jnp.arange(C)].add(
                lm_lambda * jnp.eye(6) * diag_scale)
            delta_c = _solve_cameras(prob, S, rhs)      # replicated solve
        delta_p = _back_substitute(prob, Hpp_inv, b_p, A, delta_c)  # local
        new_prob = _apply_update(prob, delta_c, delta_p)
        old_cost = jax.lax.psum(jnp.sum(r ** 2), axis)
        new_cost = jax.lax.psum(reprojection_cost(new_prob), axis)
        return new_prob, old_cost, new_cost

    return step


def bundle_adjust_sharded(prob: BAProblem, mesh, axis: str = "data",
                          max_iters: int = 20, lm_lambda0: float = 1e-4,
                          tol: float = 1e-10, solver: str = "dense",
                          cg_iters: int = 100) -> Tuple[BAProblem, float]:
    """LM loop over the sharded iteration.  `prob` must already be
    device_put with points/obs sharded on `axis` (see
    loftr_tpu.parallel.mesh helpers)."""
    step = make_sharded_ba_iteration(mesh, axis, solver, cg_iters)
    lam = lm_lambda0
    cost = None
    for _ in range(max_iters):
        cand, old_cost, new_cost = step(prob, jnp.asarray(lam))
        if cost is None:
            cost = float(old_cost)
        new_cost = float(new_cost)
        if new_cost < cost:
            prob = cand
            improved = cost - new_cost
            cost = new_cost
            lam = max(lam * 0.3, 1e-9)
            if improved < tol * max(cost, 1.0):
                break
        else:
            lam = min(lam * 10.0, 1e6)
            if lam >= 1e6:
                break
    return prob, cost
