"""Log-domain Sinkhorn optimal transport with a learned dustbin.

Clean-room implementation of the entropic partial-assignment OT used by
SuperGlue/LoFTR-OT, written from the published algorithm (SuperGlue paper,
arXiv:1911.11763, sec. 3.2).  The reference downloads this code at setup time
instead of vendoring it (/root/reference/README.md:65-74; usage at
/root/reference/src/loftr/utils/coarse_matching.py:121-143).

Semantics: scores [B, M, N] are augmented with a dustbin row and column filled
with a scalar learned ``bin_score``; the marginals give every real row/col mass
1/(M+N) and the dustbins mass N/(M+N), M/(M+N); ``iters`` Sinkhorn
normalizations run in log space; the final log-coupling is shifted by
+log(M+N) so that a perfectly matched pair approaches probability 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sinkhorn_iterations(z: jax.Array, log_mu: jax.Array, log_nu: jax.Array,
                            iters: int) -> jax.Array:
    """Run `iters` alternating row/col normalizations in log space.

    z: [B, M, N] log-kernel; log_mu: [B, M]; log_nu: [B, N].
    """
    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(z + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0), unroll=True)
    return z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: jax.Array, bin_score: jax.Array,
                          iters: int) -> jax.Array:
    """Partial-assignment OT in log space.

    Args:
      scores: [B, M, N] similarity matrix.
      bin_score: scalar learnable dustbin score.
      iters: number of Sinkhorn iterations (reference default 3,
             src/config/default.py:31).
    Returns:
      [B, M+1, N+1] log assignment matrix (dustbins last).
    """
    b, m, n = scores.shape
    dtype = scores.dtype
    alpha = jnp.asarray(bin_score, dtype)

    bins0 = jnp.full((b, m, 1), alpha, dtype)
    bins1 = jnp.full((b, 1, n), alpha, dtype)
    corner = jnp.full((b, 1, 1), alpha, dtype)
    couplings = jnp.concatenate([
        jnp.concatenate([scores, bins0], axis=2),
        jnp.concatenate([bins1, corner], axis=2),
    ], axis=1)  # [B, M+1, N+1]

    ms = jnp.asarray(m, dtype)
    ns = jnp.asarray(n, dtype)
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.full((m,), norm, dtype), (jnp.log(ns) + norm)[None]])
    log_nu = jnp.concatenate(
        [jnp.full((n,), norm, dtype), (jnp.log(ms) + norm)[None]])
    log_mu = jnp.broadcast_to(log_mu, (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu, (b, n + 1))

    z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    return z - norm
