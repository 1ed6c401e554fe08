"""Dense augmented-batch decode+Jacobian (ops/decode_jac.py) parity tests.

The fast path must match the generic ``jax.linearize``+vmap exact-log-det
machinery (densities/nonsquare.py) bit-for-bit up to fp32 contraction-order
round-off: same reconstruction, Jacobian columns, Gram, log-det, and the same
*gradients* through the full elbo (the second-order terms of the log-det
backward are where a mistake would hide).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from cmf_tpu.config import expand_grid, get_config, get_schema
from cmf_tpu.models import get_density
from cmf_tpu.ops import cholesky_logdet, gram_from_columns
from cmf_tpu.ops.decode_jac import extract_dense_decode_program


def small_tabular_schema(**overrides):
    config = expand_grid(get_config("miniboone", "non-square", use_baseline=False))[0]
    config["num_density_layers"] = 3
    config["coupler_hidden_channels"] = [16, 16]
    config["latent_dimension"] = 5
    config["prior_num_density_layers"] = 2
    config["prior_hidden_channels"] = [8]
    config.update(overrides)
    return get_schema(config)


def build(schema, dim=11, seed=0):
    density = get_density(schema, x_shape=(dim,))
    variables = density.init(jax.random.PRNGKey(seed))
    return density, variables


def both_paths(density, variables, x, train):
    pv0 = {"params": variables["params"]["prior"], "state": variables["state"]["prior"]}
    prior_info, pstate = density.prior.elbo(pv0, x, rng=None, train=train)
    z = prior_info["low_dim_x"]
    decode_flat = density._decode_fns(variables, pstate, train)

    ld_g, rec_g, gram_g = density._exact_log_det(decode_flat, z)

    prog = extract_dense_decode_program(density)
    assert prog is not None, "dense program extraction failed for supported chain"
    pv = {"params": variables["params"]["prior"], "state": pstate}
    rec_d, jac_d = prog(pv, z, train=train)
    gram_d = gram_from_columns(jac_d)
    ld_d, _ = cholesky_logdet(gram_d)
    return (ld_g, rec_g, gram_g), (ld_d, rec_d, gram_d)


@pytest.mark.parametrize("train", [False, True])
def test_dense_matches_generic_tabular(train):
    density, variables = build(small_tabular_schema())
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 11)), jnp.float32)
    (ld_g, rec_g, gram_g), (ld_d, rec_d, gram_d) = both_paths(density, variables, x, train)
    np.testing.assert_allclose(rec_d, rec_g, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gram_d, gram_g, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ld_d, ld_g, rtol=1e-4, atol=1e-4)


def test_dense_matches_generic_rich_chain():
    """Exercise every supported step kind: alternating + split-channel ACLs,
    independent-nets coupler, batch-norm, flip, random channel permutation."""
    schema = small_tabular_schema()
    # Find the outer (pre-tail) acl block and diversify it.
    tail_pos = next(i for i, l in enumerate(schema) if l["type"] == "non-square-base")
    acl_positions = [i for i, l in enumerate(schema[:tail_pos]) if l["type"] == "acl"]
    schema[acl_positions[1]]["mask_type"] = "split-channel"
    schema[acl_positions[2]]["coupler"] = {
        "independent_nets": True,
        "shift_net": {"type": "mlp", "hidden_channels": [12, 12], "activation": "relu"},
        "log_scale_net": {"type": "mlp", "hidden_channels": [12, 12], "activation": "relu"},
    }
    inserts = [
        {"type": "batch-norm", "per_channel": False, "apply_affine": True,
         "momentum": 0.1, "detach": False},
        {"type": "flip"},
        {"type": "rand-channel-perm"},
    ]
    for off, layer in enumerate(inserts):
        schema.insert(acl_positions[1] + off, copy.deepcopy(layer))

    density, variables = build(schema)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(6, 11)), jnp.float32)
    for train in (False, True):
        (ld_g, rec_g, gram_g), (ld_d, rec_d, gram_d) = both_paths(
            density, variables, x, train
        )
        np.testing.assert_allclose(rec_d, rec_g, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gram_d, gram_g, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ld_d, ld_g, rtol=1e-4, atol=1e-4)


def test_dense_gradient_parity():
    """Gradients of the full elbo (likelihood + recon + off-diagonal metric
    reg — the Gram cotangent path) must match between the two paths."""
    density, variables = build(small_tabular_schema())
    x = jnp.asarray(np.random.default_rng(2).normal(size=(5, 11)), jnp.float32)
    prog = extract_dense_decode_program(density)

    def loss(params):
        info, _ = density.elbo(
            {"params": params, "state": variables["state"]},
            x,
            train=True,
            likelihood_wt=1.0,
            metric_wt=0.3,
            add_reconstruction=True,
            add_offdiagonal_metric_reg=True,
        )
        return -jnp.mean(info["elbo"])

    density._dense_prog_cache = prog
    val_d, grad_d = jax.value_and_grad(loss)(variables["params"])
    density._dense_prog_cache = None
    val_g, grad_g = jax.value_and_grad(loss)(variables["params"])
    del density._dense_prog_cache

    np.testing.assert_allclose(val_d, val_g, rtol=1e-5)
    flat_d, _ = ravel_pytree(grad_d)
    flat_g, _ = ravel_pytree(grad_g)
    np.testing.assert_allclose(flat_d, flat_g, rtol=2e-4, atol=2e-5)


def _locate_head(density, variables):
    from cmf_tpu.densities import NonSquareHeadDensity

    node, hv = density, variables
    while not isinstance(node, NonSquareHeadDensity):
        if hasattr(node, "density"):
            node = node.density
            hv = {"params": hv["params"]["density"], "state": hv["state"]["density"]}
        else:
            node = node.prior
            hv = {"params": hv["params"]["prior"], "state": hv["state"]["prior"]}
    return node, hv


def small_image_build(**overrides):
    """Tiny multiscale mnist-geometry chain: checkerboard + squeeze +
    split-channel + SplitDensity + checkerboard over (1, 8, 8), d=4."""
    config = expand_grid(get_config("mnist", "non-square", use_baseline=False))[0]
    config.update({
        "seed": 0, "g_hidden_channels": [4, 4], "prior_num_density_layers": 2,
        "prior_hidden_channels": [8], "latent_dimension": 4,
    })
    config.update(overrides)
    density = get_density(get_schema(config), x_shape=(1, 8, 8))
    variables = density.init(jax.random.PRNGKey(0))
    return _locate_head(density, variables)


@pytest.mark.parametrize("train", [False, True])
def test_dense_matches_generic_multiscale_image(train):
    """Conv-stage parity: the augmented-batch program over the full
    multiscale image decode (checkerboard/split-channel ResNet couplers,
    squeeze, SplitDensity zero-pad) must match linearize+vmap."""
    head, hv = small_image_build()
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (3, 1, 8, 8)), jnp.float32)

    pv0 = {"params": hv["params"]["prior"], "state": hv["state"]["prior"]}
    prior_info, pstate = head.prior.elbo(pv0, x, rng=None, train=train)
    z = prior_info["low_dim_x"]
    decode_flat = head._decode_fns(hv, pstate, train)

    recon_g, lin = jax.linearize(decode_flat, z)
    d = z.shape[1]
    basis = jnp.eye(d, dtype=z.dtype)
    cols_g = jax.vmap(lambda e: lin(jnp.broadcast_to(e, z.shape)))(basis)

    prog = extract_dense_decode_program(head)
    assert prog is not None and prog.has_conv
    pv = {"params": hv["params"]["prior"], "state": pstate}
    recon_d, cols_d = prog(pv, z, train=train)

    np.testing.assert_allclose(np.asarray(recon_d), np.asarray(recon_g), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cols_d), np.asarray(cols_g), rtol=1e-3, atol=1e-4)
    ld_g, _ = cholesky_logdet(gram_from_columns(cols_g))
    ld_d, _ = cholesky_logdet(gram_from_columns(cols_d))
    np.testing.assert_allclose(np.asarray(ld_d), np.asarray(ld_g), rtol=1e-3, atol=1e-3)


def test_dense_gradient_parity_multiscale_image():
    """Gradients of log-det + reconstruction through the conv program must
    match the generic path (the second-order terms through the conv/relu/tanh
    tangent rules are where a mistake would hide)."""
    head, hv = small_image_build()
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (2, 1, 8, 8)), jnp.float32)
    prog = extract_dense_decode_program(head)

    def loss(params, use_prog):
        v = {"params": params, "state": hv["state"]}
        pv0 = {"params": params["prior"], "state": hv["state"]["prior"]}
        prior_info, pstate = head.prior.elbo(pv0, x, rng=None, train=True)
        z = prior_info["low_dim_x"]
        if use_prog:
            pv = {"params": params["prior"], "state": pstate}
            recon, cols = prog(pv, z, train=True)
        else:
            decode_flat = head._decode_fns(v, pstate, True)
            recon, lin = jax.linearize(decode_flat, z)
            basis = jnp.eye(z.shape[1], dtype=z.dtype)
            cols = jax.vmap(lambda e: lin(jnp.broadcast_to(e, z.shape)))(basis)
        ld, _ = cholesky_logdet(gram_from_columns(cols))
        rec = jnp.sum((recon - x.reshape(x.shape[0], -1)) ** 2, axis=-1)
        return jnp.sum(ld) + jnp.sum(rec)

    val_d, grad_d = jax.value_and_grad(lambda p: loss(p, True))(hv["params"])
    val_g, grad_g = jax.value_and_grad(lambda p: loss(p, False))(hv["params"])
    np.testing.assert_allclose(float(val_d), float(val_g), rtol=1e-4)
    flat_d, _ = ravel_pytree(grad_d)
    flat_g, _ = ravel_pytree(grad_g)
    np.testing.assert_allclose(np.asarray(flat_d), np.asarray(flat_g), rtol=5e-3, atol=5e-4)


def test_image_auto_solver_still_resolves_cg():
    """Even with the conv program available, 'auto' must keep iterative CG
    for conv chains (the d-column fan-out costs ~d conv passes; CG at the
    reference's relative cg_tolerance=1 costs ~4 — measured r3)."""
    head, _ = small_image_build()
    assert extract_dense_decode_program(head).has_conv
    assert head._dense_decode_program() is not None
    assert head._resolved_hutch_solver(4) == "cg"


def test_dense_used_inside_elbo():
    """elbo() must route through the dense program when one exists."""
    density, variables = build(small_tabular_schema())
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 11)), jnp.float32)
    info, _ = density.elbo(variables, x, train=True)
    assert density._dense_prog_cache is not None
    assert np.all(np.isfinite(np.asarray(info["elbo"])))
