"""Batched 5-point essential-matrix solver, fully on-device (no host roots).

TPU-native counterpart of eval/five_point.py (host numpy).  Same
hidden-variable algebra (Nister 2004 / Li-Hartley), different root finder:
``np.roots`` builds a companion matrix and calls a nonsymmetric eigensolver -
unavailable on TPU - so the real roots are isolated BRANCH-FREE on the
projective line:

  1. nullspace basis of the 5x9 epipolar system (batched SVD) gives
     E = x B0 + y B1 + z B2 + w B3;
  2. the 10 cubic essential constraints grouped by (x, y) monomials give a
     10x10 matrix C(z, w) whose entries are homogeneous in (z, w) - the
     hidden variable is treated PROJECTIVELY: (z, w) = (sin t, cos t) keeps
     every evaluation bounded (the affine z = tan t substitution overflows
     f32 near the poles and breeds spurious sign changes),
  3. f(t) = sign(det C(sin t, cos t)) on a uniform t-grid over
     [-pi/2, pi/2]; sign changes bracket the real roots (capacity 10),
  4. fixed-count bisection refines each bracket (lax.fori_loop, no
     data-dependent control flow),
  5. the nullspace of C(t*) (batched 10x10 SVD) recovers (x, y), and a
     residual-guarded Gauss-Newton polish on (x, y, t) pulls the f32 SVD
     estimate to machine precision.

Sign-of-determinant comes from slogdet's pivoted LU, stable in f32; the
interpolated-coefficient route (host version, f64) is too ill-conditioned
for f32, which is why the grid works on f directly.

Replaces the native functionality the reference consumes via OpenCV's C++
findEssentialMat 5-point path (/root/reference/src/utils/metrics.py:83-93,
SURVEY.md §2.9) with a batched, vmappable device kernel for RANSAC and the
SfM backend.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from loftr_tpu.eval.five_point import _XY_SAMPLES, _xy_vandermonde

_VINV = np.asarray(_xy_vandermonde())        # [10 monomials, 10 samples]
_XS = np.asarray(_XY_SAMPLES[:, 0])          # [10]
_YS = np.asarray(_XY_SAMPLES[:, 1])


def _det3(E: jax.Array) -> jax.Array:
    """Closed-form 3x3 determinant, any batch shape."""
    return (E[..., 0, 0] * (E[..., 1, 1] * E[..., 2, 2]
                            - E[..., 1, 2] * E[..., 2, 1])
            - E[..., 0, 1] * (E[..., 1, 0] * E[..., 2, 2]
                              - E[..., 1, 2] * E[..., 2, 0])
            + E[..., 0, 2] * (E[..., 1, 0] * E[..., 2, 1]
                              - E[..., 1, 1] * E[..., 2, 0]))


def _essential_constraints(E: jax.Array) -> jax.Array:
    """The 10 cubic essential constraints det(E), 2 E E^T E - tr(E E^T) E.

    E [..., 3, 3] -> [..., 10]."""
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = EEt[..., 0, 0] + EEt[..., 1, 1] + EEt[..., 2, 2]
    M = 2.0 * (EEt @ E) - tr[..., None, None] * E
    return jnp.concatenate(
        [_det3(E)[..., None], M.reshape(*E.shape[:-2], 9)], axis=-1)


def _nullspace4(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """[4, 3, 3] nullspace basis of the 5x9 epipolar constraint matrix."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, jnp.ones_like(x0)], axis=1)        # [5, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[5:].reshape(4, 3, 3)


def _c_matrix(basis: jax.Array, z: jax.Array, w: jax.Array) -> jax.Array:
    """Hidden-variable matrix C(z, w): basis [4,3,3], z/w [...] ->
    [..., 10, 10].

    Row k holds constraint k's coefficients over the (x, y) monomials
    {x^3, x^2 y, x y^2, y^3, x^2, x y, y^2, x, y, 1}; the coefficient of a
    degree-d monomial is homogeneous of degree 3-d in (z, w).  Obtained by
    evaluating the constraints at 10 generic (x, y) samples and applying the
    cached inverse Vandermonde (same construction as five_point._C_of_z,
    which is the w=1 affine slice)."""
    dt = z.dtype
    xs = jnp.asarray(_XS, dt)
    ys = jnp.asarray(_YS, dt)
    E = (xs[:, None, None] * basis[0] + ys[:, None, None] * basis[1]
         + z[..., None, None, None] * basis[2]
         + w[..., None, None, None] * basis[3])             # [..., S, 3, 3]
    evals = _essential_constraints(E)                       # [..., S, 10c]
    vinv = jnp.asarray(_VINV, dt)
    # C[..., c, m] = sum_s vinv[m, s] evals[..., s, c]
    return jnp.einsum("ms,...sc->...cm", vinv, evals)


def _sign_detC(basis: jax.Array, t: jax.Array) -> jax.Array:
    """sign(det C(sin t, cos t)) for any batch of angles t."""
    sign, _ = jnp.linalg.slogdet(_c_matrix(basis, jnp.sin(t), jnp.cos(t)))
    return sign


def _sign_detC_and_deriv(basis: jax.Array, t: jax.Array):
    """(sign f, sign f') for f(t) = det C(sin t, cos t).

    f'/f = tr(C^{-1} C') (Jacobi's formula), so
    sign f' = sign f * sign tr(C^{-1} C') - no explicit determinant of the
    derivative needed."""
    def C_of_t(t):
        return _c_matrix(basis, jnp.sin(t), jnp.cos(t))

    C, Cp = jax.jvp(C_of_t, (t,), (jnp.ones_like(t),))
    sign, _ = jnp.linalg.slogdet(C)
    tr = jnp.trace(jnp.linalg.solve(C, Cp), axis1=-2, axis2=-1)
    return sign, sign * jnp.sign(tr)


def _solve_5point_single(p0: jax.Array, p1: jax.Array,
                         n_roots: int = 10, grid_size: int = 256,
                         bisect_iters: int = 40, grid_chunk: int = 32):
    """All real essential matrices from 5 normalized correspondences.

    p0, p1: [5, 2].  Returns (E [n_roots, 3, 3] with ||E||=1, valid
    [n_roots] bool).  vmap over hypotheses for batched RANSAC.
    """
    dt = p0.dtype
    basis = _nullspace4(p0, p1)

    # uniform angle grid over the projective (z : w) line; t = +-pi/2 are
    # the same projective point (w = 0), so the open interval suffices
    ts = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, grid_size, dtype=dt)

    # grid signs of f and f', chunked so C [chunk, 10, 10] stays small
    signs, dsigns = jax.lax.map(
        lambda tc: _sign_detC_and_deriv(basis, tc),
        ts.reshape(-1, grid_chunk))
    signs = signs.reshape(-1)                                # [G]
    dsigns = dsigns.reshape(-1)

    G = grid_size
    flip = signs[:-1] * signs[1:] < 0                        # [G-1]

    # Twisted-pair rescue: a cell can hold TWO roots straddling one
    # extremum (observed separations ~3e-3 << grid spacing), which cancels
    # the sign change.  In cells where f' flips but f does not, bisect on
    # f' to the extremum t_e; if f(t_e) opposes the endpoints, the cell
    # splits into two true brackets.  (Degree-10 det has <= 9 extrema, so a
    # small static capacity covers all such cells.)
    N_EXT = 9
    ext_cell = (dsigns[:-1] * dsigns[1:] < 0) & ~flip
    eidx = jnp.where(ext_cell, jnp.arange(G - 1), G)
    eorder = jnp.sort(eidx)[:N_EXT]
    evalid = eorder < G
    esafe = jnp.minimum(eorder, G - 2)
    elo, ehi = ts[esafe], ts[esafe + 1]
    es_lo = dsigns[esafe]

    def ext_body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        _, s_mid = _sign_detC_and_deriv(basis, mid)
        same = s_mid == es_lo
        return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

    elo_f, ehi_f = jax.lax.fori_loop(0, 25, ext_body, (elo, ehi))
    t_e = 0.5 * (elo_f + ehi_f)                              # [N_EXT]
    s_at_e = _sign_detC(basis, t_e)
    s_cell = signs[esafe]
    pair = evalid & (s_at_e * s_cell < 0)                    # two roots

    # assemble brackets: primary sign-change cells + split extremum cells
    # + unsplit extrema as degenerate brackets (a twisted pair that f32
    # rounding pushed just past tangency has no sign change, but the
    # extremum is a near-root the GN polish can finish; junk extrema are
    # pruned by the final constraint-residual gate)
    idx = jnp.where(flip, jnp.arange(G - 1), G)
    order = jnp.sort(idx)[:n_roots]
    pvalid = order < G
    psafe = jnp.minimum(order, G - 2)
    single = evalid & ~pair
    lo_all = jnp.concatenate([ts[psafe], elo, t_e, t_e])
    hi_all = jnp.concatenate([ts[psafe + 1], t_e, ehi, t_e])
    s_lo_all = jnp.concatenate([signs[psafe], s_cell, s_at_e, s_at_e])
    v_all = jnp.concatenate([pvalid, pair, pair, single])
    # guaranteed roots (sign-change brackets) outrank extremum seeds
    prio = jnp.concatenate([
        jnp.zeros(n_roots + 2 * N_EXT), jnp.ones(N_EXT)])

    # keep the first n_roots valid brackets (invalid sort to the end)
    key = jnp.where(v_all, prio * 10.0 + lo_all, jnp.inf)
    take = jnp.argsort(key)[:n_roots]
    lo, hi = lo_all[take], hi_all[take]
    s_lo = s_lo_all[take]
    valid = v_all[take]

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        s_mid = _sign_detC(basis, mid)                       # [n_roots]
        same = s_mid == s_lo
        return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

    lo, hi = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi))
    t = 0.5 * (lo + hi)                                      # [n_roots]
    z, w = jnp.sin(t), jnp.cos(t)

    # (x, y) from the nullspace of C(t*): monomial vector [..., x, y, 1]
    C = _c_matrix(basis, z, w)                               # [R, 10, 10]
    _, _, vt = jnp.linalg.svd(C)
    m = vt[..., -1, :]                                       # [R, 10]
    denom_ok = jnp.abs(m[:, 9]) > 1e-9
    d = jnp.where(denom_ok, m[:, 9], 1.0)
    x = m[:, 7] / d
    y = m[:, 8] / d

    # Gauss-Newton polish of (x, y, t) on the 10 constraint residuals:
    # the f32 SVD nullspace is only ~1e-3 accurate near-singular; a few
    # guarded GN steps pull it to f32 machine precision.
    def residuals(v):
        E = (v[0] * basis[0] + v[1] * basis[1]
             + jnp.sin(v[2]) * basis[2] + jnp.cos(v[2]) * basis[3])
        return _essential_constraints(E)

    def res_norm(v):
        return jnp.sum(jax.vmap(residuals)(v) ** 2, axis=-1)  # [R]

    def gn_step(_, v):
        r = jax.vmap(residuals)(v)                           # [R, 10]
        J = jax.vmap(jax.jacfwd(residuals))(v)               # [R, 10, 3]
        JtJ = jnp.einsum("ria,rib->rab", J, J)
        Jtr = jnp.einsum("ria,ri->ra", J, r)
        eye = jnp.eye(3, dtype=dt) * 1e-12
        delta = jnp.linalg.solve(JtJ + eye, -Jtr[..., None])[..., 0]
        cand = v + jnp.clip(delta, -0.1, 0.1)
        # guarded update: keep the step only where it reduces the residual
        # (GN can diverge from saddle regions far from a true solution)
        better = res_norm(cand) < jnp.sum(r ** 2, axis=-1)
        return jnp.where(better[:, None], cand, v)

    v = jax.lax.fori_loop(0, 5, gn_step, jnp.stack([x, y, t], axis=-1))
    x, t = v[:, 0], v[:, 2]
    y = v[:, 1]
    E = (x[:, None, None] * basis[0] + y[:, None, None] * basis[1]
         + jnp.sin(t)[:, None, None] * basis[2]
         + jnp.cos(t)[:, None, None] * basis[3])
    n = jnp.linalg.norm(E.reshape(-1, 9), axis=-1)
    norm_ok = n > 1e-9
    E = E / jnp.where(norm_ok, n, 1.0)[:, None, None]
    # final gate: the polished, normalized E must actually satisfy the
    # essential constraints (prunes extremum seeds that were not roots;
    # cubic constraints of a unit-norm E are O(1)-scaled)
    # (1e-6: true roots polish to <=1e-8; near-roots rescued from f32-lost
    # twisted pairs sit ~1e-7; junk extremum seeds >=1e-4)
    res = jnp.sum(_essential_constraints(E) ** 2, axis=-1)
    return E, valid & denom_ok & norm_ok & (res < 1e-6)


@partial(jax.jit, static_argnames=("n_roots", "grid_size", "bisect_iters"))
def solve_5point_batched(p0: jax.Array, p1: jax.Array, n_roots: int = 10,
                         grid_size: int = 256, bisect_iters: int = 40):
    """Batched minimal solver: p0, p1 [B, 5, 2] normalized coords ->
    (E [B, n_roots, 3, 3], valid [B, n_roots])."""
    return jax.vmap(partial(_solve_5point_single, n_roots=n_roots,
                            grid_size=grid_size,
                            bisect_iters=bisect_iters))(p0, p1)
