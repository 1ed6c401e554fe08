"""Batched preconditioner-free conjugate gradients for SPD systems.

Replaces the reference's vendored gpytorch ``linear_cg``
(reference: cmf/models/components/densities/non_square.py:11-15,241-247) with a
fixed-shape ``lax.while_loop`` suitable for XLA/TPU: no data-dependent early
exit in the trace — instead a convergence mask freezes converged columns while
the loop keeps a static upper bound on iterations.

The solve is used inside a stop-gradient (the reference detaches the CG
result), so no backward pass is ever traced through the loop.
"""

import jax
import jax.numpy as jnp


def batched_cg(matvec, rhs, max_iter, tolerance=1.0, eps=1e-10):
    """Solve ``A x = rhs`` for a batch of SPD systems.

    Args:
      matvec: callable ``v -> A v`` operating on arrays shaped like ``rhs``.
        Must be linear and batched over all leading axes of ``rhs``.
      rhs: array of shape (..., d, S) — S right-hand sides per batch element
        (matching the reference's (batch, latent_dim, num_hutch_samples)
        calling convention, non_square.py:241-247).
      max_iter: static int, upper bound on CG iterations (the reference clamps
        this to the latent dimension, factory.py:124-130).
      tolerance: stop (per column) when the residual 2-norm mean over the batch
        drops below this (gpytorch semantics: mean residual norm < tolerance).
      eps: numerical floor for divisions.

    Returns:
      x: approximate solution, same shape as rhs.
    """
    x0 = jnp.zeros_like(rhs)
    r0 = rhs - matvec(x0)
    p0 = r0

    def resid_norm(r):
        # 2-norm over the d axis: shape (..., S)
        return jnp.sqrt(jnp.sum(r * r, axis=-2))

    def not_converged(r):
        return jnp.mean(resid_norm(r)) >= tolerance

    def cond_fn(carry):
        i, _, r, _ = carry
        return jnp.logical_and(i < max_iter, not_converged(r))

    def body_fn(carry):
        i, x, r, p = carry
        Ap = matvec(p)
        rr = jnp.sum(r * r, axis=-2, keepdims=True)
        pAp = jnp.sum(p * Ap, axis=-2, keepdims=True)
        alpha = rr / (pAp + eps)
        # Freeze columns that already converged (keeps numerics stable when
        # other columns need more iterations).
        active = (resid_norm(r) >= tolerance)[..., None, :].astype(rhs.dtype)
        alpha = alpha * active
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        beta = jnp.sum(r_new * r_new, axis=-2, keepdims=True) / (rr + eps)
        p_new = r_new + beta * p
        return i + 1, x_new, r_new, p_new

    _, x, _, _ = jax.lax.while_loop(cond_fn, body_fn, (0, x0, r0, p0))
    return x
