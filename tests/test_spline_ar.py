"""RQ-spline, BNAF, SOS: log-det vs autodiff, inverse consistency
(the vendored-dependency rebuilds, SURVEY.md §2.12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmf_tpu.bijections.spline import (
    AutoregressiveRationalQuadraticSplineBijection,
    CoupledRationalQuadraticSplineBijection,
    rational_quadratic_spline,
)
from cmf_tpu.bijections.bnaf import BlockNeuralAutoregressiveBijection
from cmf_tpu.bijections.sos import SumOfSquaresPolynomialBijection
from cmf_tpu.nets import get_activation


def _check_log_jac(bij, variables, x, rtol=1e-3):
    def flat_fwd(xi):
        z, _, _ = bij.forward(variables, xi[None], train=False)
        return z.reshape(-1)

    _, lj, _ = bij.forward(variables, x, train=False)
    for i in range(x.shape[0]):
        J = jax.jacfwd(flat_fwd)(x[i])
        _, expected = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(np.asarray(lj[i]), expected, rtol=rtol, atol=1e-3)


def test_rqs_elementwise_roundtrip(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.uniform(k1, (7, 5), minval=-4.0, maxval=4.0)  # incl. tails
    K = 8
    uw = jax.random.normal(k2, (7, 5, K))
    uh = jax.random.normal(k2, (7, 5, K)) * 0.5
    ud = jax.random.normal(k2, (7, 5, K - 1)) * 0.5
    y, ld = rational_quadratic_spline(x, uw, uh, ud, tail_bound=3.0, inverse=False)
    x_rt, ld_inv = rational_quadratic_spline(y, uw, uh, ud, tail_bound=3.0, inverse=True)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), rtol=1e-4, atol=1e-4)
    # Outside the tail bound: identity with zero log-det
    far = jnp.full((1, 5), 10.0)
    y_far, ld_far = rational_quadratic_spline(
        far, uw[:1], uh[:1], ud[:1], tail_bound=3.0, inverse=False
    )
    np.testing.assert_allclose(np.asarray(y_far), 10.0)
    np.testing.assert_allclose(np.asarray(ld_far), 0.0)


def test_rqs_monotone(rng):
    K = 6
    uw = jax.random.normal(rng, (1, 1, K))
    uh = jax.random.normal(rng, (1, 1, K))
    ud = jax.random.normal(rng, (1, 1, K - 1))
    xs = jnp.linspace(-2.9, 2.9, 101).reshape(-1, 1)
    ys, _ = rational_quadratic_spline(
        xs, jnp.tile(uw, (101, 1, 1)), jnp.tile(uh, (101, 1, 1)),
        jnp.tile(ud, (101, 1, 1)), tail_bound=3.0, inverse=False
    )
    assert np.all(np.diff(np.asarray(ys[:, 0])) > 0)


@pytest.mark.parametrize("reverse", [False, True])
def test_coupled_spline_bijection(rng, reverse):
    bij = CoupledRationalQuadraticSplineBijection(
        num_input_channels=6, num_hidden_layers=2, num_hidden_channels=16,
        num_bins=8, tail_bound=3.0, activation=get_activation("relu"),
        reverse_mask=reverse,
    )
    variables = bij.init(rng)
    x = jax.random.uniform(rng, (4, 6), minval=-2.0, maxval=2.0)
    z, lj, _ = bij.forward(variables, x)
    x_rt, lj_inv = bij.inverse(variables, z)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lj), -np.asarray(lj_inv), rtol=1e-4, atol=1e-4)
    _check_log_jac(bij, variables, x)


def test_ar_spline_bijection(rng):
    bij = AutoregressiveRationalQuadraticSplineBijection(
        num_input_channels=5, num_hidden_layers=2, num_hidden_channels=16,
        num_bins=8, tail_bound=3.0, activation=get_activation("relu"),
    )
    variables = bij.init(rng)
    x = jax.random.uniform(rng, (4, 5), minval=-2.0, maxval=2.0)
    z, lj, _ = bij.forward(variables, x)
    x_rt, lj_inv = bij.inverse(variables, z)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lj), -np.asarray(lj_inv), rtol=1e-4, atol=1e-4)
    _check_log_jac(bij, variables, x)


def test_bnaf_log_jac(rng):
    bij = BlockNeuralAutoregressiveBijection(
        num_input_channels=4, num_hidden_layers=1, hidden_channels_factor=6,
        activation="soft-leaky-relu", residual=True,
    )
    variables = bij.init(rng)
    x = jax.random.normal(rng, (3, 4))
    _check_log_jac(bij, variables, x)


def test_bnaf_autoregressive_structure(rng):
    """z_i must not depend on x_j for j > i."""
    bij = BlockNeuralAutoregressiveBijection(
        num_input_channels=4, num_hidden_layers=1, hidden_channels_factor=5,
        activation="soft-leaky-relu", residual=False,
    )
    variables = bij.init(rng)
    x = jax.random.normal(rng, (1, 4))

    def fwd(xi):
        z, _, _ = bij.forward(variables, xi[None])
        return z[0]

    J = np.asarray(jax.jacfwd(fwd)(x[0]))
    assert np.allclose(np.triu(J, 1), 0.0), "BNAF Jacobian must be lower triangular"
    assert np.all(np.diag(J) > 0), "BNAF diagonal must be positive (monotone)"


def test_sos_log_jac(rng):
    bij = SumOfSquaresPolynomialBijection(
        num_input_channels=4, hidden_channels=[16, 16],
        activation=get_activation("tanh"), num_polynomials=2, polynomial_degree=3,
    )
    variables = bij.init(rng)
    x = jax.random.normal(rng, (3, 4)) * 0.5
    _check_log_jac(bij, variables, x)

    def fwd(xi):
        z, _, _ = bij.forward(variables, xi[None])
        return z[0]

    J = np.asarray(jax.jacfwd(fwd)(x[0]))
    assert np.allclose(np.triu(J, 1), 0.0)
    assert np.all(np.diag(J) > 0)
