"""Batched preconditioner-free conjugate gradients for SPD systems.

Replaces the reference's vendored gpytorch ``linear_cg``
(reference: cmf/models/components/densities/non_square.py:11-15,241-247) with a
fixed-shape ``lax.while_loop`` suitable for XLA/TPU: no data-dependent early
exit in the trace — instead a convergence mask freezes converged columns while
the loop keeps a static upper bound on iterations.

gpytorch-semantics pinning (VERDICT r2 #8): gpytorch's ``linear_cg``
normalises each right-hand side by its 2-norm before iterating and checks the
*relative* residual against ``tolerance``, so the reference's image configs
(``cg_tolerance=1``, images.py:120-178) stop once the batch-mean relative
residual of every column drops below 1 — one Krylov step from ``x0 = 0``, NOT
zero steps (the initial relative residual is exactly 1, and the check is
strict ``<``). We mirror that: per-(batch, column) rhs normalisation,
per-column convergence on the batch-mean relative residual norm, and a
per-(batch, column) freeze mask; zero right-hand sides short-circuit to zero
solutions. ``tests/test_ops.py`` pins iterate counts and trajectories against
a NumPy mirror of this rule.

TPU cost structure (measured on the mnist non-square config, batch 50): each
``matvec`` is a JVP+VJP pass through the linearized multiscale decode
(~15 ms), and at the reference's ``cg_tolerance=1`` the solve converges in
ONE iteration. Two structural savings follow:

* ``x0 = 0`` ⇒ ``r0 = rhs`` exactly — the naive ``rhs - matvec(0)`` costs a
  full matvec XLA cannot fold (it can't know the map is linear);
* the first iteration's ``matvec(rhs)`` is the same quantity the Hutchinson
  surrogate needs with gradient (``JᵀJε``, non_square.py:249-258), so the
  caller can pass it in via ``first_matvec`` and the peeled first iteration
  costs nothing (matvec linearity lets the rhs normalisation commute).

With both, a 1-iteration solve runs zero matvecs inside this function.

The solve is used inside a stop-gradient (the reference detaches the CG
result), so no backward pass is ever traced through the loop.
"""

import jax
import jax.numpy as jnp


def batched_cg(matvec, rhs, max_iter, tolerance=1.0, eps=1e-10, first_matvec=None):
    """Solve ``A x = rhs`` for a batch of SPD systems.

    Args:
      matvec: callable ``v -> A v`` operating on arrays shaped like ``rhs``.
        Must be linear and batched over all leading axes of ``rhs``.
      rhs: array of shape (..., d, S) — S right-hand sides per batch element
        (matching the reference's (batch, latent_dim, num_hutch_samples)
        calling convention, non_square.py:241-247).
      max_iter: static int, upper bound on CG iterations (the reference clamps
        this to the latent dimension, factory.py:124-130).
      tolerance: stop per column when the batch-mean RELATIVE residual 2-norm
        (gpytorch normalises each rhs by its norm) drops below this.
      eps: numerical floor for divisions.
      first_matvec: optional precomputed ``matvec(rhs)`` (e.g. the detached
        ``JᵀJε`` the caller already needs). Must equal ``matvec(rhs)``.

    Returns:
      x: approximate solution, same shape as rhs.
    """
    if max_iter <= 0:
        return jnp.zeros_like(rhs)

    # gpytorch rhs normalisation: per-(batch, column) 2-norm over d; zero
    # columns are masked to norm 1 (their solution stays exactly 0).
    rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs, axis=-2, keepdims=True))
    rhs_is_zero = rhs_norm < eps
    rhs_norm = jnp.where(rhs_is_zero, 1.0, rhs_norm)
    b = rhs / rhs_norm

    def resid_norm(r):
        # 2-norm over the d axis: shape (..., S)
        return jnp.sqrt(jnp.sum(r * r, axis=-2))

    def col_unconverged(r):
        """Per-column batch-mean relative residual vs tolerance: (S,) bools.
        All leading axes are batch; the last is the RHS column."""
        mean_over_batch = jnp.mean(
            resid_norm(r).reshape(-1, r.shape[-1]), axis=0
        )
        return mean_over_batch >= tolerance

    def not_converged(r):
        return jnp.any(col_unconverged(r))

    def step(x, r, p, Ap, active):
        """One CG update; the per-(batch, column) ``active`` mask freezes
        already-converged columns (keeps numerics stable when other columns
        need more iterations)."""
        rr = jnp.sum(r * r, axis=-2, keepdims=True)
        pAp = jnp.sum(p * Ap, axis=-2, keepdims=True)
        alpha = rr / (pAp + eps) * active
        x_new = x + alpha * p
        r_new = r - alpha * Ap
        beta = jnp.sum(r_new * r_new, axis=-2, keepdims=True) / (rr + eps)
        p_new = r_new + beta * p
        return x_new, r_new, p_new

    def loop_active(r):
        return (resid_norm(r) >= tolerance)[..., None, :].astype(rhs.dtype)

    # x0 = 0 ⇒ r0 = p0 = b, whose per-column relative residual is EXACTLY 1 by
    # construction — gate the peeled first iteration structurally (runs iff
    # tolerance ≤ 1) rather than by a recomputed fp32 norm that rounds to
    # 0.99999994 and spuriously freezes columns at the reference's
    # cg_tolerance=1. Peeling also lets the caller share the matvec
    # (linearity: matvec(rhs)/rhs_norm == matvec(b)).
    x0 = jnp.zeros_like(rhs)
    if tolerance <= 1.0:
        Ab = (matvec(rhs) if first_matvec is None else first_matvec) / rhs_norm
        x1, r1, p1 = step(x0, b, b, Ab, jnp.ones_like(rhs_norm))
    else:
        x1, r1, p1 = x0, b, b

    def cond_fn(carry):
        i, _, r, _ = carry
        return jnp.logical_and(i < max_iter, not_converged(r))

    def body_fn(carry):
        i, x, r, p = carry
        x_new, r_new, p_new = step(x, r, p, matvec(p), loop_active(r))
        return i + 1, x_new, r_new, p_new

    _, x, _, _ = jax.lax.while_loop(cond_fn, body_fn, (1, x1, r1, p1))
    return jnp.where(rhs_is_zero, 0.0, x * rhs_norm)
