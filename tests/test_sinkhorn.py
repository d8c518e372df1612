"""Unit tests: log-domain Sinkhorn OT vs an independent numpy oracle and
its mathematical invariants."""
import numpy as np
import jax.numpy as jnp
from scipy.special import logsumexp

from loftr_tpu.ops.sinkhorn import log_optimal_transport


def np_log_ot(scores, alpha, iters):
    """Independent numpy implementation from the algorithm definition."""
    b, m, n = scores.shape
    couplings = np.full((b, m + 1, n + 1), alpha, np.float64)
    couplings[:, :m, :n] = scores
    norm = -np.log(m + n)
    log_mu = np.concatenate([np.full(m, norm), [np.log(n) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(m) + norm]])
    u = np.zeros((b, m + 1))
    v = np.zeros((b, n + 1))
    for _ in range(iters):
        u = log_mu[None] - logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu[None] - logsumexp(couplings + u[:, :, None], axis=1)
    z = couplings + u[:, :, None] + v[:, None, :]
    return z - norm


def test_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    scores = rng.randn(2, 6, 8).astype(np.float32)
    got = np.asarray(log_optimal_transport(jnp.asarray(scores),
                                           jnp.asarray(1.0), 3))
    want = np_log_ot(scores.astype(np.float64), 1.0, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_marginals_after_convergence():
    """After many iterations the coupling satisfies the OT marginals."""
    rng = np.random.RandomState(1)
    m, n = 5, 7
    scores = rng.randn(1, m, n).astype(np.float32)
    z = np.asarray(log_optimal_transport(jnp.asarray(scores),
                                         jnp.asarray(0.5), 200))
    # returned Z is log(P) + log(m+n); P is the coupling
    P = np.exp(z) / (m + n)
    col_sums = P.sum(axis=1)[0]     # exactly normalized (last update is v)
    expect_cols = np.concatenate([np.full(n, 1.0 / (m + n)),
                                  [m / (m + n)]])
    np.testing.assert_allclose(col_sums, expect_cols, rtol=1e-4)
    row_sums = P.sum(axis=2)[0]
    expect_rows = np.concatenate([np.full(m, 1.0 / (m + n)),
                                  [n / (m + n)]])
    np.testing.assert_allclose(row_sums, expect_rows, rtol=1e-3)


def test_strong_match_dominates():
    """A hugely dominant score should capture most of its row's mass."""
    scores = np.zeros((1, 4, 4), np.float32)
    scores[0, 2, 3] = 20.0
    z = np.asarray(log_optimal_transport(jnp.asarray(scores),
                                         jnp.asarray(1.0), 50))
    conf = np.exp(z)[0, :4, :4]
    assert conf[2, 3] > 0.9
    assert conf[2, 3] == conf.max()
