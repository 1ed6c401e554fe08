"""Per-bijection contract tests (the suite the reference lacks, SURVEY.md §4):
inverse-consistency, log-jac vs autodiff slogdet, shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmf_tpu.bijections import (
    AffineBijection,
    AlternatingChannelwiseCouplingBijection,
    BatchNormBijection,
    BruteForceInvertible1x1ConvBijection,
    Checkerboard2dCouplingBijection,
    FlipBijection,
    LogitBijection,
    LUInvertible1x1ConvBijection,
    LULinearBijection,
    MADEBijection,
    MaskedChannelwiseCouplingBijection,
    RandomChannelwisePermutationBijection,
    ScalarAdditionBijection,
    ScalarMultiplicationBijection,
    SplitChannelwiseCouplingBijection,
    Squeeze2dBijection,
    TanhBijection,
    ViewBijection,
)
from cmf_tpu.couplers import ChunkedSharedCoupler, IndependentCoupler
from cmf_tpu.nets import MLP, ResNet, get_activation


def mlp_coupler(n_in, n_out):
    return ChunkedSharedCoupler(MLP(n_in, [16, 16], 2 * n_out, jnp.tanh))


def flat_bijections():
    d = 6
    yield AffineBijection((d,), per_channel=False), (d,)
    yield AffineBijection((d,), per_channel=True), (d,)
    yield AlternatingChannelwiseCouplingBijection(
        (d,), lambda np_: mlp_coupler(np_, d - np_), reverse_mask=False
    ), (d,)
    yield AlternatingChannelwiseCouplingBijection(
        (d,), lambda np_: mlp_coupler(np_, d - np_), reverse_mask=True
    ), (d,)
    yield SplitChannelwiseCouplingBijection(
        (d,), lambda np_: mlp_coupler(np_, d - np_), reverse_mask=False
    ), (d,)
    yield SplitChannelwiseCouplingBijection(
        (d,), lambda np_: mlp_coupler(np_, d - np_), reverse_mask=True
    ), (d,)
    yield MaskedChannelwiseCouplingBijection(
        (d,), lambda np_: mlp_coupler(np_, d - np_), mask=np.array([1, 0, 1, 0, 0, 1], bool)
    ), (d,)
    yield MADEBijection(d, [16, 16], get_activation("tanh")), (d,)
    yield LULinearBijection(d), (d,)
    yield BruteForceInvertible1x1ConvBijection((d,)), (d,)
    yield LUInvertible1x1ConvBijection((d,)), (d,)
    yield RandomChannelwisePermutationBijection((d,)), (d,)
    yield FlipBijection((d,)), (d,)
    yield ScalarMultiplicationBijection((d,), 2.5), (d,)
    yield ScalarAdditionBijection((d,), -0.7), (d,)
    yield TanhBijection((d,)), (d,)
    yield ViewBijection((d,), (2, 3)), (d,)
    yield BatchNormBijection((d,), per_channel=False, apply_affine=True, momentum=0.1), (d,)


def image_bijections():
    shape = (4, 4, 4)
    c = shape[0]

    def resnet_factory(np_):
        return ChunkedSharedCoupler(ResNet(np_, [8], 2 * (c - np_), use_batchnorm=False))

    yield Checkerboard2dCouplingBijection(
        shape, ChunkedSharedCoupler(ResNet(c, [8], 2 * c, use_batchnorm=False)), reverse_mask=False
    ), shape
    yield SplitChannelwiseCouplingBijection(shape, resnet_factory, reverse_mask=True), shape
    yield Squeeze2dBijection(shape, factor=2), shape
    yield BruteForceInvertible1x1ConvBijection(shape), shape
    yield LUInvertible1x1ConvBijection(shape), shape
    yield BatchNormBijection(shape, per_channel=True, apply_affine=True, momentum=0.1), shape


def all_cases():
    for b, s in flat_bijections():
        yield pytest.param(b, s, id=type(b).__name__ + str(s))
    for b, s in image_bijections():
        yield pytest.param(b, s, id=type(b).__name__ + str(s) + "_img")


@pytest.mark.parametrize("bij,shape", list(all_cases()))
def test_inverse_consistency(bij, shape, rng):
    key_init, key_x = jax.random.split(rng)
    variables = bij.init(key_init)
    x = jax.random.uniform(key_x, (5, *shape), minval=-1.5, maxval=1.5)
    if isinstance(bij, (LogitBijection,)):
        x = jax.nn.sigmoid(x)
    if isinstance(bij, TanhBijection):
        x = 0.8 * jnp.tanh(x)

    z, lj_fwd, _ = bij.forward(variables, x, train=False)
    assert z.shape == (5, *bij.z_shape)
    assert lj_fwd.shape == (5,)

    x_rt, lj_inv = bij.inverse(variables, z, train=False)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lj_fwd), -np.asarray(lj_inv), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("bij,shape", list(all_cases()))
def test_log_jac_vs_autodiff(bij, shape, rng):
    """log-jac must equal slogdet of the autodiff Jacobian of the flattened
    map (SURVEY.md §4a)."""
    key_init, key_x = jax.random.split(rng)
    variables = bij.init(key_init)
    x = jax.random.uniform(key_x, (2, *shape), minval=-1.2, maxval=1.2)
    if isinstance(bij, (LogitBijection,)):
        x = jax.nn.sigmoid(x)
    if isinstance(bij, TanhBijection):
        x = 0.8 * jnp.tanh(x)

    # Batch-coupled bijections (batch-norm in train mode) are excluded — their
    # per-example Jacobian is not defined independently of the batch.
    train = False

    def flat_fwd(xi):
        z, _, _ = bij.forward(variables, xi[None], train=train)
        return z.reshape(-1)

    _, lj, _ = bij.forward(variables, x, train=train)
    for i in range(x.shape[0]):
        J = jax.jacfwd(flat_fwd)(x[i])
        _, expected = np.linalg.slogdet(np.asarray(J.reshape(int(np.prod(shape)), -1)))
        np.testing.assert_allclose(np.asarray(lj[i]), expected, rtol=1e-3, atol=1e-3)


def test_batchnorm_train_stats_roundtrip(rng):
    """Training forward then inverse with the stored batch stats must be the
    identity (the decoder-replay contract, batchnorm.py:79-84)."""
    bij = BatchNormBijection((6,), per_channel=False, apply_affine=True, momentum=0.1)
    variables = bij.init(rng)
    x = jax.random.normal(rng, (32, 6)) * 3.0 + 1.0
    z, _, new_state = bij.forward(variables, x, train=True)
    v2 = {"params": variables["params"], "state": new_state}
    x_rt, _ = bij.inverse(v2, z, train=True)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), rtol=1e-4, atol=1e-4)
    # Running stats moved toward batch stats
    assert not np.allclose(np.asarray(new_state["running_mean"]), 0.0)


def test_batchnorm_momentum_one_snapshot(rng):
    bij = BatchNormBijection((4,), per_channel=False, apply_affine=False, momentum=1.0)
    variables = bij.init(rng)
    x = jax.random.normal(rng, (64, 4)) * 2.0 + 5.0
    _, _, new_state = bij.forward(variables, x, train=True)
    np.testing.assert_allclose(
        np.asarray(new_state["running_mean"]), np.asarray(jnp.mean(x, 0)), rtol=1e-5
    )
