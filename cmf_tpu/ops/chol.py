"""Jittered batched Cholesky and log-det for JᵀJ Gram matrices.

The reference retries ``torch.linalg.cholesky`` with escalating ``eps·I``
jitter on failure (non_square.py:263-291: eps=1e-6, ×10 per retry, max 6
attempts). Under XLA there are no exceptions: ``jnp.linalg.cholesky`` yields
NaNs for non-PD inputs, so the retry becomes a fixed-shape ``lax.while_loop``
over the whole batch that adds jitter until every factor is finite.
"""

import jax
import jax.numpy as jnp

_EPS0 = 1e-6
_EPS_FACTOR = 10.0
_MAX_ATTEMPTS = 6


def jittered_cholesky(gram):
    """Batched lower-Cholesky of SPD matrices with escalating-jitter retry.

    Args:
      gram: (..., d, d) symmetric positive (semi-)definite matrices.

    Returns:
      (L, total_jitter): L is (..., d, d) lower triangular; total_jitter is a
      scalar — the eps actually added to the diagonal (0.0 if the first attempt
      succeeded), exposed for logging parity with the reference's warning.
    """
    d = gram.shape[-1]
    eye = jnp.eye(d, dtype=gram.dtype)

    def attempt(g):
        L = jnp.linalg.cholesky(g)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    L0, ok0 = attempt(gram)

    def cond_fn(carry):
        i, _, ok, _, _ = carry
        return jnp.logical_and(~ok, i < _MAX_ATTEMPTS)

    def body_fn(carry):
        i, g, _, eps, total = carry
        g = g + eps * eye
        L, ok = attempt(g)
        return i + 1, g, ok, eps * _EPS_FACTOR, total + eps

    _, _, _, _, total_jitter = jax.lax.while_loop(
        cond_fn, body_fn, (0, gram, ok0, jnp.asarray(_EPS0, gram.dtype), jnp.asarray(0.0, gram.dtype))
    )
    # Re-run the factorization on the final jittered matrix in a single pass so
    # that gradients flow through one clean cholesky (the while_loop above is
    # non-differentiable; it only discovers the jitter level).
    total_jitter = jax.lax.stop_gradient(total_jitter)
    L = jnp.linalg.cholesky(gram + total_jitter * eye)
    return L, total_jitter


def cholesky_logdet(gram):
    """log|G| for a batch of SPD matrices via jittered Cholesky.

    Matches non_square.py:293-294: ``2·Σ log diag(L)``.

    Returns (logdet (...,), total_jitter scalar).
    """
    L, total_jitter = jittered_cholesky(gram)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1), total_jitter
