"""Jittered batched Cholesky and log-det for JᵀJ Gram matrices.

The reference retries ``torch.linalg.cholesky`` with escalating ``eps·I``
jitter on failure (non_square.py:263-291: eps=1e-6, ×10 per retry, max 6
attempts). Under XLA there are no exceptions: a non-PD input yields NaNs, so
the retry becomes a fixed-shape ``lax.while_loop`` that adds jitter until the
factor is finite.

TPU note: XLA's Cholesky HLO lowers to a blocked right-looking algorithm that
is catastrophically slow for *small batched* matrices — measured 1.36 ms for
(400, 21, 21) fp32 on v5e, more than the entire rest of the non-square train
step. ``_small_cholesky`` replaces it for static d ≤ ``_UNROLL_MAX``: an
unrolled column-by-column Cholesky–Banachiewicz over uniform-shape masked
updates, fully vectorized over the batch (0.25 ms fwd, 0.57 ms fwd+grad for
the same shape — 2.7× faster). Gradients flow through plain jnp ops; chained
through the symmetric Gram they match ``jnp.linalg.cholesky`` to 1e-8.
"""

import jax
import jax.numpy as jnp

_EPS0 = 1e-6
_EPS_FACTOR = 10.0
_MAX_ATTEMPTS = 6
# Unrolled small-matrix path bound: covers every latent dimension the config
# groups use (2-D: 1-3, tabular: 2-30, images: ≤64). Above this the XLA
# blocked Cholesky wins on arithmetic intensity.
_UNROLL_MAX = 64


def _small_cholesky(g):
    """Batched Cholesky for small static d via unrolled masked column updates.

    Only the lower triangle (incl. diagonal) of ``g`` is read; a non-PD input
    produces NaN in and below the offending pivot (sqrt of a negative), so
    finiteness checks used for the jitter retry behave like the LAPACK-style
    failure the reference catches (non_square.py:280-291).
    """
    d = g.shape[-1]
    idx = jnp.arange(d)
    L = jnp.zeros_like(g)
    for j in range(d):
        rowj = L[..., j, :]
        # s_i = g[i, j] − Σ_k L[i, k]·L[j, k]  (cols k ≥ j of L are still 0)
        s = g[..., :, j] - jnp.einsum(
            "...ik,...k->...i", L, rowj, precision=jax.lax.Precision.HIGHEST
        )
        col = s / jnp.sqrt(s[..., j])[..., None]
        L = L.at[..., :, j].set(jnp.where(idx >= j, col, 0.0))
    return L


def _cholesky(g):
    if g.shape[-1] <= _UNROLL_MAX:
        return _small_cholesky(g)
    return jnp.linalg.cholesky(g)


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

    L0 = _cholesky(gram)
    ok0 = jnp.all(jnp.isfinite(L0))

    def discover_jitter(_):
        # Non-differentiable escalation loop; it only finds the jitter level.
        def cond_fn(carry):
            i, _, ok, _, _ = carry
            return jnp.logical_and(~ok, i < _MAX_ATTEMPTS)

        def body_fn(carry):
            i, g, _, eps, total = carry
            g = g + eps * eye
            L = _cholesky(g)
            return i + 1, g, jnp.all(jnp.isfinite(L)), eps * _EPS_FACTOR, total + eps

        _, _, _, _, total = jax.lax.while_loop(
            cond_fn,
            body_fn,
            (
                0,
                jax.lax.stop_gradient(gram),
                jnp.asarray(False),
                jnp.asarray(_EPS0, gram.dtype),
                jnp.asarray(0.0, gram.dtype),
            ),
        )
        return total

    # Happy path (the overwhelmingly common case) pays exactly one
    # factorization: reuse L0 when no jitter was needed; otherwise re-run a
    # single clean differentiable factorization at the discovered level.
    total_jitter = jax.lax.cond(
        ok0,
        lambda _: jnp.asarray(0.0, gram.dtype),
        discover_jitter,
        operand=None,
    )
    total_jitter = jax.lax.stop_gradient(total_jitter)
    L = jax.lax.cond(
        ok0,
        lambda args: args[0],
        lambda args: _cholesky(args[1] + args[2] * eye),
        (L0, gram, total_jitter),
    )
    return L, total_jitter


def _small_solve_lower(L, b):
    """Forward substitution ``L y = b`` for small static d, batched.

    Same rationale as ``_small_cholesky``: XLA's TriangularSolve HLO is blocked
    and slow for small batched systems on TPU; d sequential vectorized column
    updates win. b is (..., d, S)."""
    d = L.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(d):
        s = b[..., i, :] - jnp.einsum(
            "...k,...ks->...s", L[..., i, :], y, precision=jax.lax.Precision.HIGHEST
        )
        y = y.at[..., i, :].set(s / L[..., i, i][..., None])
    return y


def _small_solve_lower_t(L, b):
    """Back substitution ``Lᵀ x = b`` for small static d, batched."""
    d = L.shape[-1]
    x = jnp.zeros_like(b)
    for i in reversed(range(d)):
        s = b[..., i, :] - jnp.einsum(
            "...k,...ks->...s", L[..., :, i], x, precision=jax.lax.Precision.HIGHEST
        )
        x = x.at[..., i, :].set(s / L[..., i, i][..., None])
    return x


def spd_solve(gram, rhs):
    """Solve ``G x = rhs`` for a batch of SPD matrices via jittered Cholesky.

    Args:
      gram: (..., d, d) SPD matrices.
      rhs: (..., d, S) right-hand sides.

    Returns:
      (x, L): the solution (..., d, S) and the Cholesky factor (for log-det
      reuse: ``2 Σ log diag L``). Non-PD inputs get the same escalating-jitter
      treatment as ``jittered_cholesky`` (non_square.py:263-291 semantics).
    """
    L, _ = jittered_cholesky(gram)
    if gram.shape[-1] <= _UNROLL_MAX:
        y = _small_solve_lower(L, rhs)
        x = _small_solve_lower_t(L, y)
    else:
        y = jax.lax.linalg.triangular_solve(
            L, rhs, left_side=True, lower=True, transpose_a=False
        )
        x = jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )
    return x, L


def cholesky_logdet(gram):
    """log|G| for a batch of SPD matrices via jittered Cholesky.

    Matches non_square.py:293-294: ``2·Σ log diag(L)``.

    Returns (logdet (...,), total_jitter scalar).
    """
    L, total_jitter = jittered_cholesky(gram)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1), total_jitter
