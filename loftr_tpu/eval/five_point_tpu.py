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
from loftr_tpu.ops import compensated as cf

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


def _residuals_df(basis: jax.Array, v: jax.Array) -> jax.Array:
    """The 10 essential constraints of E(v) in double-float arithmetic.

    basis [4, 3, 3]; v [..., 3] = (x, y, t).  Returns [..., 10] rounded to
    the base dtype but accurate to ~|r| * eps + eps^2 — plain f32
    evaluation carries ~1e-7 ABSOLUTE cancellation noise, which near a
    twisted pair (residual quadratic in the parameters) floors the
    Gauss-Newton polish at ~1e-3 parameter error; compensated evaluation
    moves the floor to the f32 representability of v itself (~1e-7)."""
    x, y = v[..., 0], v[..., 1]
    z, w = jnp.sin(v[..., 2]), jnp.cos(v[..., 2])
    # E = x B0 + y B1 + z B2 + w B3 as exact two_prod sums
    E = {}
    for i in range(3):
        for j in range(3):
            E[i, j] = cf.df_sum(*[cf.two_prod(c, basis[k, i, j])
                                  for k, c in enumerate((x, y, z, w))])

    def mm(A, B):
        out = {}
        for i in range(3):
            for j in range(3):
                acc = cf.df_mul(A[i, 0], B[0, j])
                for k in (1, 2):
                    acc = cf.df_add(acc, cf.df_mul(A[i, k], B[k, j]))
                out[i, j] = acc
        return out

    Et = {(i, j): E[j, i] for i in range(3) for j in range(3)}
    EEt = mm(E, Et)
    tr = cf.df_sum(EEt[0, 0], EEt[1, 1], EEt[2, 2])
    EEtE = mm(EEt, E)
    res = []
    # det(E) (cofactor expansion, all df)
    c0 = cf.df_sub(cf.df_mul(E[1, 1], E[2, 2]), cf.df_mul(E[1, 2], E[2, 1]))
    c1 = cf.df_sub(cf.df_mul(E[1, 0], E[2, 2]), cf.df_mul(E[1, 2], E[2, 0]))
    c2 = cf.df_sub(cf.df_mul(E[1, 0], E[2, 1]), cf.df_mul(E[1, 1], E[2, 0]))
    det = cf.df_add(cf.df_sub(cf.df_mul(E[0, 0], c0), cf.df_mul(E[0, 1], c1)),
                    cf.df_mul(E[0, 2], c2))
    res.append(cf.df_hi(det))
    # 2 E E^T E - tr(E E^T) E
    for i in range(3):
        for j in range(3):
            m = cf.df_sub(cf.df_scale(EEtE[i, j], 2.0),
                          cf.df_mul(tr, E[i, j]))
            res.append(cf.df_hi(m))
    return jnp.stack(res, axis=-1)


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


def _constraints_df_of_E(E: dict) -> list:
    """The 10 essential constraints of a df 3x3 matrix E (dict (i,j)->df).

    Returns a list of 10 df values (det first, then the 9 entries of
    2 E E^T E - tr(E E^T) E, row-major)."""
    def mm(A, B):
        out = {}
        for i in range(3):
            for j in range(3):
                acc = cf.df_mul(A[i, 0], B[0, j])
                for k in (1, 2):
                    acc = cf.df_add(acc, cf.df_mul(A[i, k], B[k, j]))
                out[i, j] = acc
        return out

    Et = {(i, j): E[j, i] for i in range(3) for j in range(3)}
    EEt = mm(E, Et)
    tr = cf.df_sum(EEt[0, 0], EEt[1, 1], EEt[2, 2])
    EEtE = mm(EEt, E)
    c0 = cf.df_sub(cf.df_mul(E[1, 1], E[2, 2]), cf.df_mul(E[1, 2], E[2, 1]))
    c1 = cf.df_sub(cf.df_mul(E[1, 0], E[2, 2]), cf.df_mul(E[1, 2], E[2, 0]))
    c2 = cf.df_sub(cf.df_mul(E[1, 0], E[2, 1]), cf.df_mul(E[1, 1], E[2, 0]))
    det = cf.df_add(cf.df_sub(cf.df_mul(E[0, 0], c0), cf.df_mul(E[0, 1], c1)),
                    cf.df_mul(E[0, 2], c2))
    return [det] + [cf.df_sub(cf.df_scale(EEtE[i, j], 2.0),
                              cf.df_mul(tr, E[i, j]))
                    for i in range(3) for j in range(3)]


def _c_matrix_df(basis: jax.Array, t: jax.Array):
    """C(sin t, cos t) in double-float: basis [4,3,3], t [...] ->
    df pair of [..., 10, 10].

    Same interpolation construction as _c_matrix, but every product and sum
    is compensated, and the sample coordinates / inverse Vandermonde enter
    as hi+lo splits of their f64 values — so the result is the C matrix of
    the exact f32-basis polynomial to ~2^-45, instead of carrying the ~1e-7
    absolute cancellation noise of plain f32 evaluation.  Near a twisted
    pair the determinant dip between the two roots sits far below that
    noise, which is exactly where the f32 sign test fails."""
    dt = t.dtype
    xs = cf.df_const(_XS, dt)                  # df [S]
    ys = cf.df_const(_YS, dt)
    vinv = cf.df_const(_VINV, dt)              # df [M, S]
    z, w = jnp.sin(t), jnp.cos(t)              # exact reparameterization
    shp = t.shape + (10,)                      # [..., S]
    bc = lambda a: jnp.broadcast_to(a, shp)

    E = {}
    for i in range(3):
        for j in range(3):
            # E_s = xs_s B0 + ys_s B1 + z B2 + w B3, all df, shape [..., S]
            t0 = cf.df_mul((bc(xs[0]), bc(xs[1])), cf.df(basis[0, i, j]))
            t1 = cf.df_mul((bc(ys[0]), bc(ys[1])), cf.df(basis[1, i, j]))
            t2 = cf.two_prod(z, basis[2, i, j])
            t3 = cf.two_prod(w, basis[3, i, j])
            E[i, j] = cf.df_sum(t0, t1, (bc(t2[0][..., None]),
                                         bc(t2[1][..., None])),
                                (bc(t3[0][..., None]), bc(t3[1][..., None])))
    evals = _constraints_df_of_E(E)            # 10 x df [..., S]
    # C[..., c, m] = sum_s vinv[m, s] * evals_c[..., s]
    rows_hi, rows_lo = [], []
    for c in range(10):
        ev = evals[c]
        acc = cf.df_mul((ev[0][..., 0:1], ev[1][..., 0:1]),
                        (vinv[0][:, 0], vinv[1][:, 0]))   # [..., M]
        for s in range(1, 10):
            acc = cf.df_add(acc, cf.df_mul(
                (ev[0][..., s:s + 1], ev[1][..., s:s + 1]),
                (vinv[0][:, s], vinv[1][:, s])))
        rows_hi.append(acc[0])
        rows_lo.append(acc[1])
    return jnp.stack(rows_hi, axis=-2), jnp.stack(rows_lo, axis=-2)


def _equilibrate_df(Ah: jax.Array, Al: jax.Array):
    """Row- then column-scale a df matrix by powers of two.

    Dividing hi AND lo by the same power of two is EXACT (no df repair
    needed) and positive scales never change sign(det).  C matrices of
    ill-scaled bases carry row norms spread over ~10 decades (observed:
    det ~ 1e-22 at a twisted-pair dip whose equilibrated det is ~1e-11),
    and without equilibration the GE noise of even double-float arithmetic
    sits above the dip — the roots are invisible at any precision that
    works at the raw scale."""
    for axis in (-1, -2):
        m = jnp.max(jnp.abs(Ah), axis=axis, keepdims=True)
        s = jnp.exp2(jnp.floor(jnp.log2(jnp.maximum(m, 1e-30))))
        Ah, Al = Ah / s, Al / s
    return Ah, Al


def _det_sign_df(Ah: jax.Array, Al: jax.Array) -> jax.Array:
    """sign(det A) of a df [..., 10, 10] matrix by compensated Gaussian
    elimination with partial pivoting (sign from pivot signs + row swaps),
    after exact power-of-two equilibration."""
    return _det_sign_logabs_df(*_equilibrate_df(Ah, Al))[0]


def _det_sign_logabs_df(Ah: jax.Array, Al: jax.Array):
    """(sign, log|det|) of a df [..., 10, 10] matrix via compensated LU.

    log|det| is of the matrix AS GIVEN — callers wanting scale-invariant
    signs should equilibrate first (see _det_sign_df)."""
    n = Ah.shape[-1]
    sign = jnp.ones(Ah.shape[:-2], Ah.dtype)
    rows = jnp.arange(n)
    for k in range(n - 1):
        col = jnp.abs(Ah[..., :, k] + Al[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)            # exclude done rows
        p = jnp.argmax(col, axis=-1)                     # [...]
        # swap rows k <-> p
        pk = p[..., None, None]
        row_p_h = jnp.take_along_axis(Ah, jnp.broadcast_to(pk, Ah.shape[:-2] + (1, n)), axis=-2)
        row_p_l = jnp.take_along_axis(Al, jnp.broadcast_to(pk, Ah.shape[:-2] + (1, n)), axis=-2)
        row_k_h = Ah[..., k:k + 1, :]
        row_k_l = Al[..., k:k + 1, :]
        is_k = (rows[:, None] == k)
        is_p = (rows[:, None] == p[..., None, None])
        Ah = jnp.where(is_k, row_p_h, jnp.where(is_p, row_k_h, Ah))
        Al = jnp.where(is_k, row_p_l, jnp.where(is_p, row_k_l, Al))
        sign = sign * jnp.where(p == k, 1.0, -1.0)
        piv = (Ah[..., k, k, None], Al[..., k, k, None])   # [..., 1]
        piv_safe = (jnp.where(piv[0] == 0, 1.0, piv[0]),
                    jnp.where(piv[0] == 0, 0.0, piv[1]))
        f = cf.df_div((Ah[..., :, k], Al[..., :, k]), piv_safe)  # [..., n]
        below = (rows > k).astype(Ah.dtype)
        f = (f[0] * below, f[1] * below)
        upd = cf.df_mul((f[0][..., None], f[1][..., None]),
                        (Ah[..., k:k + 1, :], Al[..., k:k + 1, :]))
        Ah, Al = cf.df_sub((Ah, Al), upd)
    diag_h = jnp.diagonal(Ah, axis1=-2, axis2=-1)
    diag_l = jnp.diagonal(Al, axis1=-2, axis2=-1)
    d = diag_h + diag_l
    logabs = jnp.sum(jnp.log(jnp.maximum(jnp.abs(d), 1e-38)), axis=-1)
    return sign * jnp.prod(jnp.sign(d), axis=-1), logabs


def _sign_detC_df(basis: jax.Array, t: jax.Array) -> jax.Array:
    """Compensated sign(det C(sin t, cos t)) — reliable inside the f32
    noise dip between twisted-pair roots."""
    return _det_sign_df(*_c_matrix_df(basis, t))


def _sign_detC_and_deriv(basis: jax.Array, t: jax.Array):
    """(sign f, log|f|, sign f') for f(t) = det C(sin t, cos t).

    f'/f = tr(C^{-1} C') (Jacobi's formula), so
    sign f' = sign f * sign tr(C^{-1} C') - no explicit determinant of the
    derivative needed.  log|f| is returned so callers can identify grid
    points sitting in the f32 noise basement (|f| below evaluation noise),
    whose signs must be re-derived with compensated arithmetic."""
    def C_of_t(t):
        return _c_matrix(basis, jnp.sin(t), jnp.cos(t))

    C, Cp = jax.jvp(C_of_t, (t,), (jnp.ones_like(t),))
    sign, logabs = jnp.linalg.slogdet(C)
    tr = jnp.trace(jnp.linalg.solve(C, Cp), axis1=-2, axis2=-1)
    return sign, logabs, sign * jnp.sign(tr)


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
    signs, logabs, dsigns = jax.lax.map(
        lambda tc: _sign_detC_and_deriv(basis, tc),
        ts.reshape(-1, grid_chunk))
    signs = signs.reshape(-1)                                # [G]
    logabs = logabs.reshape(-1)
    dsigns = dsigns.reshape(-1)

    # NOISE-BASEMENT CORRECTION: where |f| sits below f32 evaluation noise
    # (tiny-|det| grid points — near-root neighborhoods and ill-scaled
    # twisted-pair basements), the f32 slogdet sign is a coin flip, and a
    # wrong grid sign hides or fabricates sign-change cells.  Re-derive the
    # K lowest-|det| grid signs with compensated arithmetic.
    K_FIX = 12
    worst = jnp.argsort(logabs)[:K_FIX]                      # [K_FIX]
    s_fix = _sign_detC_df(basis, ts[worst])
    signs = signs.at[worst].set(s_fix)

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
    # Noise-basement cells: |f| many decades below the grid median.  The
    # f32 f' signs that flag extremum cells are themselves coin flips
    # there, so a twisted pair deep in the basement is invisible to BOTH
    # the f and f' scans (observed: a pair with raw |det| ~ 1e-22 inside
    # a grid whose median |det| is ~1e-13) — treat every basement cell as
    # a pair candidate regardless of the f' flags.
    cell_lab = jnp.minimum(logabs[:-1], logabs[1:])
    basement = (cell_lab < jnp.median(logabs) - 9.0) & ~flip
    cand = ext_cell | basement
    pr_key = jnp.where(cand, cell_lab, jnp.inf)
    eorder = jnp.argsort(pr_key)[:N_EXT]                     # deepest first
    evalid = jnp.isfinite(pr_key[eorder])
    esafe = jnp.minimum(eorder, G - 2)
    elo, ehi = ts[esafe], ts[esafe + 1]
    es_lo = dsigns[esafe]

    def ext_body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        _, _, s_mid = _sign_detC_and_deriv(basis, mid)
        same = s_mid == es_lo
        return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

    elo_f, ehi_f = jax.lax.fori_loop(0, 25, ext_body, (elo, ehi))
    t_e = 0.5 * (elo_f + ehi_f)                              # [N_EXT]

    # COMPENSATED sign probes across the flagged cell: between twisted-pair
    # roots the determinant dip is far below f32 evaluation noise, so the
    # plain slogdet sign is a coin flip there and the pair never splits
    # (measured: 9/512 random geometries lose one root of a pair that way).
    # The f32 f'-bisected t_e can itself sit outside a shallow dip (|f'|
    # below noise over a band), so probe t_e PLUS fixed interior fractions;
    # any probe whose df-sign opposes the cell sign splits the cell there.
    # 16 probes: spacing cell/16 ~ 7.7e-4 at grid 256 — below the
    # narrowest observed pair-dip width (~1.5e-3), so a dip straddling the
    # cell interior cannot slip between probes
    fracs = jnp.asarray(np.arange(1, 16) / 16.0, dt)         # [15]
    t_pr = jnp.concatenate(
        [elo[:, None] + (ehi - elo)[:, None] * fracs, t_e[:, None]],
        axis=1)                                              # [N_EXT, 16]
    s_pr = _sign_detC_df(basis, t_pr)                        # [N_EXT, 16]
    s_cell = signs[esafe]
    opp = s_pr * s_cell[:, None] < 0                         # [N_EXT, 16]
    pair = evalid & jnp.any(opp, axis=1)                     # two roots
    pidx = jnp.argmax(opp, axis=1)
    t_e = jnp.where(pair,
                    jnp.take_along_axis(t_pr, pidx[:, None], axis=1)[:, 0],
                    t_e)
    s_at_e = jnp.where(pair, -s_cell, _sign_detC_df(basis, t_e))

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
        # compensated sign: split pair brackets bisect INSIDE the f32
        # noise dip, where plain slogdet signs are noise
        s_mid = _sign_detC_df(basis, mid)                    # [n_roots]
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

    # Gauss-Newton polish of (x, y, t) on the 10 constraint residuals.
    # Residuals are evaluated in COMPENSATED (double-float) arithmetic:
    # plain f32 evaluation has ~1e-7 absolute cancellation noise, and near
    # a twisted pair the residual is quadratic in the parameters, so that
    # noise floors the polish at ~1e-3 E-error (measured: 10/512 random
    # geometries miss GT at 1e-3 in plain f32; 1/512 with df residuals).
    # The Jacobian stays plain f32 — GN only needs its first order.
    def residuals(v):
        E = (v[0] * basis[0] + v[1] * basis[1]
             + jnp.sin(v[2]) * basis[2] + jnp.cos(v[2]) * basis[3])
        return _essential_constraints(E)

    def res_norm(v):
        return jnp.sum(_residuals_df(basis, v) ** 2, axis=-1)  # [R]

    def gn_step(_, v):
        r = _residuals_df(basis, v)                          # [R, 10]
        J = jax.vmap(jax.jacfwd(residuals))(v)               # [R, 10, 3]
        # least-squares step via SVD of J, NOT normal equations: near a
        # twisted pair J's smallest singular value ~ the root separation,
        # and squaring the condition number (JtJ) makes the f32 solve lose
        # the degenerate direction entirely (measured: polish stalls at
        # ~7e-3 E-error; SVD step converges to ~1e-5)
        U, s, Vt = jnp.linalg.svd(J, full_matrices=False)    # [R,10,3],[R,3]
        s_inv = jnp.where(s > 1e-6 * s[..., :1], 1.0 / s, 0.0)
        delta = -jnp.einsum("rab,rb->ra", jnp.swapaxes(Vt, -1, -2),
                            s_inv * jnp.einsum("ria,ri->ra", U, r))
        # scale-aware step limit: x/y can be O(10) when E is dominated by
        # one basis vector, and near a twisted pair dy/dt can be O(300) —
        # a fixed +-0.1 clip leaves the root unreachable from a bisection
        # seed whose t error maps to an O(1) y error (measured on the
        # seed-468 twin: y must travel 1.5; 8 x 0.1 steps stall at 4.7e-3).
        # The guarded update below is the real divergence protection.
        lim = 0.1 * jnp.maximum(1.0, jnp.abs(v))
        cand = v + jnp.clip(delta, -lim, lim)
        # guarded update: keep the step only where it reduces the residual
        # (GN can diverge from saddle regions far from a true solution)
        better = res_norm(cand) < jnp.sum(r ** 2, axis=-1)
        return jnp.where(better[:, None], cand, v)

    v = jax.lax.fori_loop(0, 12, gn_step, jnp.stack([x, y, t], axis=-1))
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
    # cubic constraints of a unit-norm E are O(1)-scaled).  Evaluated in
    # double-float from v and rescaled by ||E||^6 (cubic constraints), so
    # the gate sees the true residual, not f32 evaluation noise.
    # (1e-6: true roots polish to <=1e-10 now; near-roots rescued from
    # f32-lost twisted pairs sit ~1e-7; junk extremum seeds >= 1e-4)
    res = jnp.sum(_residuals_df(basis, v) ** 2, axis=-1)
    res = res / jnp.where(norm_ok, n, 1.0) ** 6
    return E, valid & denom_ok & norm_ok & (res < 1e-6)


@partial(jax.jit, static_argnames=("n_roots", "grid_size", "bisect_iters"))
def solve_5point_batched(p0: jax.Array, p1: jax.Array, n_roots: int = 10,
                         grid_size: int = 256, bisect_iters: int = 40):
    """Batched minimal solver: p0, p1 [B, 5, 2] normalized coords ->
    (E [B, n_roots, 3, 3], valid [B, n_roots]).

    Matmul precision is pinned to 'highest' HERE, not left to the caller:
    on TPU the default f32 matmul truncates to bf16 passes on the MXU,
    which destroys the SVD nullspace / slogdet sign tests (measured: all 9
    hard twisted-pair geometries fail at default precision on a v5e; all
    recover with 'highest').  The 10x10 determinants are tiny, so the
    3-pass f32 cost is irrelevant next to dispatch."""
    with jax.default_matmul_precision("highest"):
        return jax.vmap(partial(_solve_5point_single, n_roots=n_roots,
                                grid_size=grid_size,
                                bisect_iters=bisect_iters))(p0, p1)
