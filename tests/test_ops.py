"""Tests for the TPU math kernels: batched CG, jittered Cholesky, Gram."""

import jax
import jax.numpy as jnp
import numpy as np

from cmf_tpu.ops import (
    batched_cg,
    cholesky_logdet,
    gram_from_columns,
    jittered_cholesky,
    spd_solve,
)


def _random_spd(rng, batch, d, cond=10.0):
    a = jax.random.normal(rng, (batch, d, d))
    return jnp.einsum("bij,bkj->bik", a, a) + jnp.eye(d) * (1.0 / cond)


def test_batched_cg_solves(rng):
    A = _random_spd(rng, 4, 8)
    x_true = jax.random.normal(jax.random.fold_in(rng, 1), (4, 8, 3))
    rhs = jnp.einsum("bij,bjs->bis", A, x_true)
    x = batched_cg(lambda v: jnp.einsum("bij,bjs->bis", A, v), rhs, max_iter=64, tolerance=1e-6)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=1e-2, atol=1e-2)


def test_batched_cg_exact_in_d_iters(rng):
    """CG on an SPD system converges within d iterations in exact arithmetic
    (the reference clamps max_iter to the latent dim, factory.py:124-130)."""
    d = 6
    A = _random_spd(rng, 2, d, cond=3.0)
    x_true = jax.random.normal(jax.random.fold_in(rng, 2), (2, d, 1))
    rhs = jnp.einsum("bij,bjs->bis", A, x_true)
    x = batched_cg(lambda v: jnp.einsum("bij,bjs->bis", A, v), rhs, max_iter=d + 2, tolerance=1e-30)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=5e-2, atol=5e-2)


def test_jittered_cholesky_spd(rng):
    A = _random_spd(rng, 3, 5)
    L, jitter = jittered_cholesky(A)
    np.testing.assert_allclose(float(jitter), 0.0)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bkj->bik", L, L)), np.asarray(A), rtol=1e-4, atol=1e-4
    )


def test_jittered_cholesky_rescues_singular(rng):
    """A singular Gram must get escalating jitter rather than NaNs
    (non_square.py:263-291)."""
    d = 4
    a = jax.random.normal(rng, (2, d, 2))  # rank 2 < d
    A = jnp.einsum("bir,bjr->bij", a, a)
    L, jitter = jittered_cholesky(A)
    assert float(jitter) > 0
    assert np.all(np.isfinite(np.asarray(L)))
    ld, _ = cholesky_logdet(A)
    assert np.all(np.isfinite(np.asarray(ld)))


def test_spd_solve_matches_dense_solve(rng):
    """Unrolled triangular substitution path (d ≤ 64): G x = rhs."""
    A = _random_spd(rng, 4, 7)
    rhs = jax.random.normal(jax.random.fold_in(rng, 1), (4, 7, 3))
    x, L = spd_solve(A, rhs)
    expected = np.linalg.solve(np.asarray(A), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-3, atol=1e-4)
    # Returned factor supports log-det reuse
    ld = 2.0 * np.sum(np.log(np.diagonal(np.asarray(L), axis1=-2, axis2=-1)), axis=-1)
    np.testing.assert_allclose(ld, np.linalg.slogdet(np.asarray(A))[1], rtol=1e-4)


def test_spd_solve_large_d_triangular_solve_path(rng):
    """d > 64 routes through lax triangular_solve; same answer."""
    A = _random_spd(rng, 2, 70, cond=5.0)
    rhs = jax.random.normal(jax.random.fold_in(rng, 2), (2, 70, 2))
    x, _ = spd_solve(A, rhs)
    expected = np.linalg.solve(np.asarray(A), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(x), expected, rtol=2e-3, atol=1e-3)


def test_cholesky_logdet_matches_slogdet(rng):
    A = _random_spd(rng, 3, 6)
    ld, _ = cholesky_logdet(A)
    expected = np.linalg.slogdet(np.asarray(A))[1]
    np.testing.assert_allclose(np.asarray(ld), expected, rtol=1e-4)


def test_gram_from_columns(rng):
    d, B, D = 3, 4, 10
    cols = jax.random.normal(rng, (d, B, D))
    gram = gram_from_columns(cols)
    J = np.moveaxis(np.asarray(cols), 0, 2)  # (B, D, d)
    expected = np.einsum("bDi,bDj->bij", J, J)
    np.testing.assert_allclose(np.asarray(gram), expected, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- fused kernel
def test_fused_gram_logdet_interpret_matches_xla(rng):
    """Pallas fused Gram+Cholesky+log-det (interpret mode on CPU) must match
    the XLA path in values AND parameter-side gradients."""
    from cmf_tpu.ops.pallas.gram_logdet import fused_gram_logdet

    d, B, D = 5, 20, 11
    cols = jax.random.normal(rng, (d, B, D))

    gram_k, ld_k = fused_gram_logdet(cols, True)
    gram_r = gram_from_columns(cols)
    ld_r, _ = cholesky_logdet(gram_r)
    np.testing.assert_allclose(np.asarray(gram_k), np.asarray(gram_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_r), rtol=1e-4, atol=1e-4)

    def f_kernel(c):
        g, ld = fused_gram_logdet(c, True)
        return jnp.sum(ld) + jnp.sum(jnp.abs(g))

    def f_ref(c):
        g = gram_from_columns(c)
        ld, _ = cholesky_logdet(g)
        return jnp.sum(ld) + jnp.sum(jnp.abs(g))

    gk = jax.grad(f_kernel)(cols)
    gr = jax.grad(f_ref)(cols)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-3, atol=1e-3)


def test_fused_gram_logdet_nan_on_rank_deficient(rng):
    """A rank-deficient Jacobian must yield NaN log-det (like the raw XLA
    Cholesky), so the caller's jitter-retry cond falls back
    (densities/nonsquare.py _exact_log_det)."""
    from cmf_tpu.ops.pallas.gram_logdet import fused_gram_logdet

    d, B, D = 4, 3, 8
    cols = jax.random.normal(rng, (2, B, D))
    cols = jnp.concatenate([cols, cols[:1], cols[1:2]], axis=0)  # rank 2 < d
    assert cols.shape[0] == d
    _, ld = fused_gram_logdet(cols, True)
    assert not np.all(np.isfinite(np.asarray(ld)))


def test_fused_gram_logdet_edge_shapes(rng):
    """d=1 (1-D latent visualizer path) and B>128 (multi-block grid with lane
    padding) must match the XLA path."""
    from cmf_tpu.ops.pallas.gram_logdet import fused_gram_logdet

    for d, B, D in ((1, 5, 7), (3, 200, 6)):
        cols = jax.random.normal(jax.random.fold_in(rng, d), (d, B, D))
        gram_k, ld_k = fused_gram_logdet(cols, True)
        gram_r = gram_from_columns(cols)
        ld_r, _ = cholesky_logdet(gram_r)
        np.testing.assert_allclose(np.asarray(gram_k), np.asarray(gram_r), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_r), rtol=1e-4, atol=1e-4)
