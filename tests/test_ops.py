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


def test_batched_cg_first_matvec_precomputed(rng):
    """Passing first_matvec = matvec(rhs) (the shared JᵀJε factor) must leave
    the iterates bit-identical to computing it inside."""
    A = _random_spd(rng, 3, 7)
    rhs = jax.random.normal(jax.random.fold_in(rng, 3), (3, 7, 2))
    mv = lambda v: jnp.einsum("bij,bjs->bis", A, v)
    for tol in (1e-6, 1.0):
        x_plain = batched_cg(mv, rhs, max_iter=16, tolerance=tol)
        x_pre = batched_cg(mv, rhs, max_iter=16, tolerance=tol, first_matvec=mv(rhs))
        np.testing.assert_array_equal(np.asarray(x_plain), np.asarray(x_pre))


def test_batched_cg_counts_matvecs_lazily(rng):
    """The peeled structure must run exactly 1 + (iterations beyond the first)
    matvecs — and ZERO when first_matvec is supplied and the solve converges in
    one iteration (the mnist cg_tolerance=1 regime). Counted on concrete
    (non-jit) execution where the while_loop body runs per iteration."""
    d = 8
    A = jnp.broadcast_to(jnp.eye(d) * 4.0, (2, d, d))  # κ=1 → 1-iteration CG
    rhs = jax.random.normal(rng, (2, d, 1))
    calls = []
    mv = lambda v: (calls.append(1), jnp.einsum("bij,bjs->bis", A, v))[1]
    x = batched_cg(mv, rhs, max_iter=8, tolerance=1e-3, first_matvec=mv(rhs))
    np.testing.assert_allclose(np.asarray(x), np.asarray(rhs / 4.0), rtol=1e-5)
    # 1 explicit first_matvec + 1 unavoidable while_loop body TRACE; the old
    # structure additionally traced/ran matvec(x0=0) and re-ran matvec(rhs)
    # inside the loop's first executed iteration.
    assert len(calls) == 2


def test_batched_cg_zero_rhs_stays_zero(rng):
    """Zero right-hand-side columns short-circuit to zero solutions (the
    gpytorch rhs_is_zero guard); non-zero columns in the same batch still
    solve."""
    A = _random_spd(rng, 2, 4)
    rhs = jax.random.normal(jax.random.fold_in(rng, 5), (2, 4, 2))
    rhs = rhs.at[:, :, 1].set(0.0)
    mv = lambda v: jnp.einsum("bij,bjs->bis", A, v)
    x = batched_cg(mv, rhs, max_iter=32, tolerance=1e-6)
    np.testing.assert_array_equal(np.asarray(x[:, :, 1]), 0.0)
    np.testing.assert_allclose(
        np.asarray(mv(x)[:, :, 0]), np.asarray(rhs[:, :, 0]), rtol=1e-3, atol=1e-4
    )


def test_batched_cg_scale_invariant_tolerance(rng):
    """gpytorch normalises each rhs column by its norm, so tolerance is
    RELATIVE: scaling the rhs scales the solution exactly (the reference's
    cg_tolerance=1 image runs depend on this — an absolute tolerance of 1
    would change iteration counts with d and ε scale)."""
    A = _random_spd(rng, 2, 6)
    rhs = jax.random.normal(jax.random.fold_in(rng, 6), (2, 6, 2))
    mv = lambda v: jnp.einsum("bij,bjs->bis", A, v)
    x1 = batched_cg(mv, rhs, max_iter=3, tolerance=0.5)
    x2 = batched_cg(mv, rhs * 1000.0, max_iter=3, tolerance=0.5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1) * 1000.0, rtol=1e-4)


def _numpy_linear_cg(A, rhs, max_iter, tolerance, eps=1e-10):
    """NumPy mirror of the gpytorch-pinned semantics in ops/cg.py: rhs
    normalisation, per-column batch-mean relative-residual stopping, per-
    (batch, column) freeze. Returns (x, iterations_run)."""
    rhs_norm = np.linalg.norm(rhs, axis=-2, keepdims=True)
    zero = rhs_norm < eps
    rhs_norm = np.where(zero, 1.0, rhs_norm)
    b = rhs / rhs_norm
    x, r, p = np.zeros_like(b), b.copy(), b.copy()
    iters = 0

    def col_mean(r):
        return np.mean(np.linalg.norm(r, axis=-2).reshape(-1, r.shape[-1]), axis=0)

    def step(x, r, p, active):
        Ap = np.einsum("bij,bjs->bis", A, p)
        rr = np.sum(r * r, axis=-2, keepdims=True)
        alpha = rr / (np.sum(p * Ap, axis=-2, keepdims=True) + eps) * active
        x = x + alpha * p
        r_new = r - alpha * Ap
        beta = np.sum(r_new * r_new, axis=-2, keepdims=True) / (rr + eps)
        return x, r_new, r_new + beta * p

    # Structural first-iteration gate: the initial relative residual is
    # exactly 1 by construction (see ops/cg.py).
    if tolerance <= 1.0 and max_iter >= 1:
        x, r, p = step(x, r, p, np.ones_like(rhs_norm))
        iters += 1
    while iters < max_iter and np.any(col_mean(r) >= tolerance):
        active = (np.linalg.norm(r, axis=-2) >= tolerance)[..., None, :]
        x, r, p = step(x, r, p, active)
        iters += 1
    return np.where(zero, 0.0, x * rhs_norm), iters


def test_batched_cg_trajectory_pins_gpytorch_semantics(rng):
    """Iterate-count / residual-trajectory pinning (VERDICT r2 #8): on a fixed
    SPD family the jitted solver must reproduce the NumPy mirror's iterates at
    EVERY max_iter truncation, for both the reference's loose image tolerance
    (1.0) and a tight one."""
    A = np.asarray(_random_spd(rng, 3, 8, cond=5.0), np.float64)
    rhs = np.asarray(
        jax.random.normal(jax.random.fold_in(rng, 7), (3, 8, 2)), np.float64
    )
    mv = lambda v: jnp.einsum("bij,bjs->bis", jnp.asarray(A, jnp.float32), v)
    for tol in (1.0, 1e-2):
        full, n_full = _numpy_linear_cg(A, rhs, max_iter=16, tolerance=tol)
        assert 1 <= n_full <= 16  # the loose tolerance must not skip the solve
        for k in (1, 2, 3, 8, 16):
            expect, _ = _numpy_linear_cg(A, rhs, max_iter=k, tolerance=tol)
            got = batched_cg(mv, jnp.asarray(rhs, jnp.float32), max_iter=k, tolerance=tol)
            # fp64 mirror vs fp32 solver: trajectories drift with iteration
            # depth; the single-step iterate pins tightly.
            rtol = 2e-3 if k == 1 else 5e-2
            np.testing.assert_allclose(np.asarray(got), expect, rtol=rtol, atol=1e-3)
        # Beyond convergence the iterates are frozen: max_iter ≫ n_full
        # reproduces the converged solution (no drift from extra updates).
        got_full = batched_cg(mv, jnp.asarray(rhs, jnp.float32), max_iter=16, tolerance=tol)
        np.testing.assert_allclose(np.asarray(got_full), full, rtol=5e-2, atol=1e-3)


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


def test_fused_gram_logdet_sharded_matches_unsharded(rng, monkeypatch):
    """shard_map wrapper over a ("data", "model") mesh — the multichip exact
    path (densities/nonsquare.py) — must match the unsharded kernel in values
    and gradients, with columns sharded over "model" and batch over "data".
    CMF_TPU_PALLAS_INTERPRET=1 makes the availability gates admit the CPU
    backend (the same switch the multichip dryrun uses)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("CMF_TPU_PALLAS_INTERPRET", "1")

    from cmf_tpu.ops.pallas.gram_logdet import (
        fused_gram_logdet,
        fused_gram_logdet_sharded,
        fused_gram_logdet_sharded_available,
    )

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    d, B, D = 6, 24, 11
    cols = jax.random.normal(rng, (d, B, D))
    sharding = NamedSharding(mesh, P("model", "data", None))
    assert fused_gram_logdet_sharded_available(d, B, D, sharding)
    cols_sh = jax.device_put(cols, sharding)

    gram_s, ld_s = jax.jit(
        lambda c: fused_gram_logdet_sharded(c, sharding, interpret=True)
    )(cols_sh)
    gram_u, ld_u = fused_gram_logdet(cols, True)
    np.testing.assert_allclose(np.asarray(gram_s), np.asarray(gram_u), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_s), np.asarray(ld_u), rtol=1e-4, atol=1e-4)

    def f_sharded(c):
        g, ld = fused_gram_logdet_sharded(c, sharding, interpret=True)
        return jnp.sum(ld) + jnp.sum(jnp.abs(g))

    def f_unsharded(c):
        g, ld = fused_gram_logdet(c, True)
        return jnp.sum(ld) + jnp.sum(jnp.abs(g))

    gs = jax.jit(jax.grad(f_sharded))(cols_sh)
    gu = jax.grad(f_unsharded)(cols)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gu), rtol=1e-3, atol=1e-3)

    # Indivisible axes must be rejected by the static gate.
    assert not fused_gram_logdet_sharded_available(5, B, D, sharding)  # d % 2
    assert not fused_gram_logdet_sharded_available(d, 25, D, sharding)  # B % 4


def test_fused_coupler_stack_matches_resnet(rng, monkeypatch):
    """Fused ResNet-coupler kernel (interpret mode on CPU) must reproduce
    nets.core.ResNet.apply exactly at the image-chain geometries
    (28×28 checkerboard and 14×14 post-squeeze, batchnorm-free)."""
    monkeypatch.setenv("CMF_TPU_PALLAS_INTERPRET", "1")
    from cmf_tpu.nets import ResNet
    from cmf_tpu.ops.pallas.coupler_stack import (
        fused_coupler_available,
        fused_resnet_coupler,
    )

    assert fused_coupler_available()
    for c_in, c_out, hw, blocks, batch in ((1, 2, 28, 2, 6), (4, 8, 14, 3, 5)):
        net = ResNet(c_in, [16] * blocks, c_out, use_batchnorm=False)
        variables = net.init(jax.random.fold_in(rng, hw))
        x = jax.random.normal(jax.random.fold_in(rng, hw + 1), (batch, c_in, hw, hw))
        ref, _ = net.apply(variables, x, train=False)
        for kw, tol in ({}, 2e-5), ({"stack_taps": True}, 2e-5), \
                       ({"bf16": True}, 3e-2), \
                       ({"bf16": True, "stack_taps": True}, 3e-2):
            got = fused_resnet_coupler(x, variables["params"], num_blocks=blocks,
                                       interpret=True, **kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=tol, atol=tol, err_msg=str(kw))


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
