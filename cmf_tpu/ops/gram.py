"""JᵀJ Gram construction from decoder Jacobian columns.

The reference stacks d JVP columns into (B, D, d) and calls ``bmm(Jᵀ, J)``
(non_square.py:298-311). Here the columns arrive as (d, B, D) straight from
``jax.vmap`` over ``jax.linearize`` tangents; the contraction is a single
batched matmul that XLA tiles onto the MXU. Precision is forced to HIGHEST —
TPU matmuls default to bf16 accumulation, which is not acceptable for a matrix
that is about to be Cholesky-factorized (SURVEY.md §7 "numerical parity").
"""

import jax
import jax.numpy as jnp


def gram_from_columns(jac_cols):
    """(d, B, D) Jacobian columns → (B, d, d) Gram matrices JᵀJ.

    ``jac_cols[i, b, :]`` is J e_i for batch element b.
    """
    return jnp.einsum(
        "ibD,jbD->bij",
        jac_cols,
        jac_cols,
        precision=jax.lax.Precision.HIGHEST,
    )
