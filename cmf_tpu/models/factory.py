"""Model factory: schema (list of layer dicts) → Density tree.

Contract: reference cmf/models/factory.py:55-517. Differences by design:
* no ``DataParallelDensity`` wrapper (factory.py:74-82) — parallelism is a
  mesh/sharding property of the train step, not a model node (SURVEY.md §2.18);
* the returned density is a static-config object; parameters come from
  ``density.init(key)`` and live in an explicit pytree.
"""

import numpy as np

from ..bijections import (
    AffineBijection,
    AlternatingChannelwiseCouplingBijection,
    AutoregressiveRationalQuadraticSplineBijection,
    BatchNormBijection,
    BlockNeuralAutoregressiveBijection,
    BruteForceInvertible1x1ConvBijection,
    Checkerboard2dCouplingBijection,
    ConditionalAffineBijection,
    ConditionalPlanarBijection,
    CoupledRationalQuadraticSplineBijection,
    FlipBijection,
    LogitBijection,
    LUInvertible1x1ConvBijection,
    LULinearBijection,
    MADEBijection,
    PlanarBijection,
    RandomChannelwisePermutationBijection,
    ScalarAdditionBijection,
    ScalarMultiplicationBijection,
    SplitChannelwiseCouplingBijection,
    Squeeze2dBijection,
    SumOfSquaresPolynomialBijection,
    TanhBijection,
    ViewBijection,
)
from ..couplers import ChunkedSharedCoupler, IndependentCoupler
from ..densities import (
    BijectionDensity,
    DequantizationDensity,
    DiagonalGaussianConditionalDensity,
    DiagonalGaussianDensity,
    ELBODensity,
    ManifoldFlowHeadDensity,
    NonSquareHeadDensity,
    NonSquareTailDensity,
    PassthroughBeforeEvalDensity,
    SplitDensity,
)
from ..nets import ConstantNetwork, GlowCNN, IdentityNetwork, MLP, ResNet, get_activation


def get_density(schema, x_shape):
    """Build the density tree for input shape ``x_shape`` (no batch dim).

    ``passthrough-before-eval`` as the first layer wraps the rest; its data
    batch is attached later by the experiment layer (it needs training data —
    reference factory.py:64-72 samples num_passthrough_data_points rows).
    """
    if schema and schema[0]["type"] == "passthrough-before-eval":
        return PassthroughBeforeEvalDensity(
            density=get_density_recursive(schema[1:], x_shape),
            num_points=schema[0]["num_passthrough_data_points"],
        )
    return get_density_recursive(schema, x_shape)


def get_standard_gaussian_density(x_shape):
    return DiagonalGaussianDensity(shape=x_shape, num_fixed_samples=64)


def get_density_recursive(schema, x_shape):
    if not schema:
        return get_standard_gaussian_density(x_shape)

    layer_config = schema[0]
    schema_tail = schema[1:]
    ty = layer_config["type"]

    if ty == "dequantization":
        return DequantizationDensity(density=get_density_recursive(schema_tail, x_shape))

    if ty == "split":
        split_x_shape = (x_shape[0] // 2, *x_shape[1:])
        return SplitDensity(
            density_1=get_density_recursive(schema_tail, split_x_shape),
            density_2=get_standard_gaussian_density(split_x_shape),
            axis=1,
            non_square=layer_config["non_square"],
        )

    if ty == "passthrough-before-eval":
        raise AssertionError("`passthrough-before-eval` must occur first in a schema")

    if ty == "non-square-head":
        head_cls = ManifoldFlowHeadDensity if layer_config["m_flow"] else NonSquareHeadDensity
        if layer_config["max_cg_iterations"]:
            max_cg_iterations = min(
                layer_config["max_cg_iterations"], layer_config["latent_dimension"]
            )
        else:
            max_cg_iterations = layer_config["latent_dimension"]
        return head_cls(
            prior=get_density_recursive(schema_tail, x_shape),
            regularization_param=layer_config["regularization_param"],
            log_jacobian_method=layer_config["log_jacobian_method"],
            x_shape=x_shape,
            hutchinson_distribution=layer_config["hutchinson_distribution"],
            num_hutchinson_samples=layer_config["hutchinson_samples"],
            max_cg_iterations=max_cg_iterations,
            cg_tolerance=layer_config["cg_tolerance"],
            latent_dimension=layer_config["latent_dimension"],
            hutchinson_solver=layer_config.get("hutchinson_solver", "auto"),
        )

    if ty == "non-square-base":
        return NonSquareTailDensity(
            prior=get_density_recursive(schema_tail, (layer_config["latent_dimension"],)),
            x_shape=x_shape,
            latent_dimension=layer_config["latent_dimension"],
            detach_before_prior=layer_config["m_flow"],
        )

    return get_bijection_density(layer_config, schema_tail, x_shape)


def get_bijection_density(layer_config, schema_tail, x_shape):
    bijection = get_bijection(layer_config, x_shape)
    prior = get_density_recursive(schema_tail, bijection.z_shape)

    if layer_config.get("num_u_channels", 0) == 0:
        return BijectionDensity(bijection=bijection, prior=prior)

    return ELBODensity(
        bijection=bijection,
        prior=prior,
        p_u_density=get_conditional_density(
            layer_config["num_u_channels"], layer_config["p_coupler"], x_shape
        ),
        q_u_density=get_conditional_density(
            layer_config["num_u_channels"], layer_config["q_coupler"], x_shape
        ),
    )


def get_bijection(layer_config, x_shape):
    ty = layer_config["type"]

    if ty == "acl":
        return get_acl_bijection(layer_config, x_shape)
    if ty == "squeeze":
        return Squeeze2dBijection(x_shape=x_shape, factor=layer_config["factor"])
    if ty == "logit":
        return LogitBijection(x_shape=x_shape)
    if ty == "sigmoid":
        return LogitBijection(x_shape=x_shape).inverse_bijection()
    if ty == "tanh":
        return TanhBijection(x_shape=x_shape)
    if ty == "scalar-mult":
        return ScalarMultiplicationBijection(x_shape=x_shape, value=layer_config["value"])
    if ty == "scalar-add":
        return ScalarAdditionBijection(x_shape=x_shape, value=layer_config["value"])
    if ty == "flatten":
        return ViewBijection(x_shape=x_shape, z_shape=(int(np.prod(x_shape)),))
    if ty == "made":
        assert len(x_shape) == 1
        return MADEBijection(
            num_input_channels=x_shape[0],
            hidden_channels=layer_config["hidden_channels"],
            activation=get_activation(layer_config["activation"]),
        )
    if ty == "batch-norm":
        return BatchNormBijection(
            x_shape=x_shape,
            per_channel=layer_config["per_channel"],
            apply_affine=layer_config["apply_affine"],
            momentum=layer_config["momentum"],
            detach=layer_config["detach"],
        )
    if ty == "affine":
        return AffineBijection(x_shape=x_shape, per_channel=layer_config["per_channel"])
    if ty == "cond-affine":
        return ConditionalAffineBijection(
            x_shape=x_shape,
            coupler=get_coupler(
                input_shape=(layer_config["num_u_channels"], *x_shape[1:]),
                num_channels_per_output=x_shape[0],
                config=layer_config["st_coupler"],
            ),
        )
    if ty == "flip":
        return FlipBijection(x_shape=x_shape, axis=1)
    if ty == "invconv":
        cls = LUInvertible1x1ConvBijection if layer_config["lu"] else BruteForceInvertible1x1ConvBijection
        return cls(x_shape=x_shape)
    if ty == "linear":
        assert len(x_shape) == 1
        return LULinearBijection(num_input_channels=x_shape[0])
    if ty == "rand-channel-perm":
        return RandomChannelwisePermutationBijection(x_shape=x_shape)
    if ty == "sos":
        assert len(x_shape) == 1
        return SumOfSquaresPolynomialBijection(
            num_input_channels=x_shape[0],
            hidden_channels=layer_config["hidden_channels"],
            activation=get_activation(layer_config["activation"]),
            num_polynomials=layer_config["num_polynomials"],
            polynomial_degree=layer_config["polynomial_degree"],
        )
    if ty == "nsf-ar":
        assert len(x_shape) == 1
        return AutoregressiveRationalQuadraticSplineBijection(
            num_input_channels=x_shape[0],
            num_hidden_layers=layer_config["num_hidden_layers"],
            num_hidden_channels=layer_config["num_hidden_channels"],
            num_bins=layer_config["num_bins"],
            tail_bound=layer_config["tail_bound"],
            activation=get_activation(layer_config["activation"]),
            dropout_probability=layer_config["dropout_probability"],
        )
    if ty == "nsf-c":
        assert len(x_shape) == 1
        return CoupledRationalQuadraticSplineBijection(
            num_input_channels=x_shape[0],
            num_hidden_layers=layer_config["num_hidden_layers"],
            num_hidden_channels=layer_config["num_hidden_channels"],
            num_bins=layer_config["num_bins"],
            tail_bound=layer_config["tail_bound"],
            activation=get_activation(layer_config["activation"]),
            dropout_probability=layer_config["dropout_probability"],
            reverse_mask=layer_config["reverse_mask"],
        )
    if ty == "bnaf":
        assert len(x_shape) == 1
        return BlockNeuralAutoregressiveBijection(
            num_input_channels=x_shape[0],
            num_hidden_layers=layer_config["num_hidden_layers"],
            hidden_channels_factor=layer_config["hidden_channels_factor"],
            activation=layer_config["activation"],
            residual=layer_config["residual"],
        )
    if ty == "planar":
        assert len(x_shape) == 1
        return PlanarBijection(num_input_channels=x_shape[0])
    if ty == "cond-planar":
        assert len(x_shape) == 1
        return ConditionalPlanarBijection(
            num_input_channels=x_shape[0],
            num_u_channels=layer_config["num_u_channels"],
            cond_hidden_channels=layer_config["cond_hidden_channels"],
            cond_activation=get_activation(layer_config["cond_activation"]),
        )
    raise AssertionError(f"Invalid layer type {ty}")


def get_acl_bijection(config, x_shape):
    num_x_channels = x_shape[0]
    num_u_channels = config["num_u_channels"]

    if config["mask_type"] == "checkerboard":
        return Checkerboard2dCouplingBijection(
            x_shape=x_shape,
            coupler=get_coupler(
                input_shape=(num_x_channels + num_u_channels, *x_shape[1:]),
                num_channels_per_output=num_x_channels,
                config=config["coupler"],
            ),
            reverse_mask=config["reverse_mask"],
        )

    def coupler_factory(num_passthrough_channels):
        return get_coupler(
            input_shape=(num_passthrough_channels + num_u_channels, *x_shape[1:]),
            num_channels_per_output=num_x_channels - num_passthrough_channels,
            config=config["coupler"],
        )

    if config["mask_type"] == "alternating-channel":
        return AlternatingChannelwiseCouplingBijection(
            x_shape=x_shape, coupler_factory=coupler_factory, reverse_mask=config["reverse_mask"]
        )
    if config["mask_type"] == "split-channel":
        return SplitChannelwiseCouplingBijection(
            x_shape=x_shape, coupler_factory=coupler_factory, reverse_mask=config["reverse_mask"]
        )
    raise AssertionError(f"Invalid mask type {config['mask_type']}")


def get_conditional_density(num_u_channels, coupler_config, x_shape):
    return DiagonalGaussianConditionalDensity(
        coupler=get_coupler(
            input_shape=x_shape,
            num_channels_per_output=num_u_channels,
            config=coupler_config,
        )
    )


def get_coupler(input_shape, num_channels_per_output, config):
    if config["independent_nets"]:
        return IndependentCoupler(
            shift_net=get_coupler_net(input_shape, num_channels_per_output, config["shift_net"]),
            log_scale_net=get_coupler_net(
                input_shape, num_channels_per_output, config["log_scale_net"]
            ),
        )
    return ChunkedSharedCoupler(
        shift_log_scale_net=get_coupler_net(
            input_shape, 2 * num_channels_per_output, config["shift_log_scale_net"]
        )
    )


def get_coupler_net(input_shape, num_output_channels, net_config):
    num_input_channels = input_shape[0]
    ty = net_config["type"]

    if ty == "mlp":
        assert len(input_shape) == 1
        return MLP(
            n_in=num_input_channels,
            hidden=net_config["hidden_channels"],
            n_out=num_output_channels,
            activation=get_activation(net_config["activation"]),
        )
    if ty == "resnet":
        assert len(input_shape) == 3
        return ResNet(
            c_in=num_input_channels,
            hidden_channels=net_config["hidden_channels"],
            c_out=num_output_channels,
            use_batchnorm=net_config.get("batchnorm", True),
            detach_bn=net_config.get("ignore_batch_effects", False),
        )
    if ty == "glow-cnn":
        assert len(input_shape) == 3
        return GlowCNN(
            c_in=num_input_channels,
            c_hidden=net_config["num_hidden_channels"],
            c_out=num_output_channels,
            zero_init_output=net_config["zero_init_output"],
        )
    if ty == "constant":
        return ConstantNetwork(
            shape=(num_output_channels, *input_shape[1:]),
            value=net_config["value"],
            fixed=net_config["fixed"],
        )
    if ty == "identity":
        assert num_output_channels == num_input_channels
        return IdentityNetwork()
    raise AssertionError(f"Invalid net type {ty}")
