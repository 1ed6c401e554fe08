"""Config system + schema compiler + factory integration tests.

Every registered model config must compile to a schema and build an
initialisable density whose elbo/sample run on small inputs (SURVEY.md §4e).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmf_tpu.config import expand_grid, get_config, get_datasets, get_models, get_schema, GridParams
from cmf_tpu.models import get_density


def test_registry_contents():
    datasets = get_datasets()
    assert "sphere" in datasets and "miniboone" in datasets and "mnist" in datasets
    models = get_models()
    for m in ["non-square", "realnvp", "maf", "nsf-ar", "bnaf", "sos", "planar", "glow"]:
        assert m in models


def test_nonsquare_config_merges_underlying_flow():
    cfg = get_config("sphere", "non-square", use_baseline=False)
    assert cfg["non_square"] is True
    assert cfg["schema_type"] == "flat-realnvp"
    # underlying realnvp provides coupler_hidden_channels; non-square overrides epochs
    assert cfg["coupler_hidden_channels"] == [10] * 2
    assert cfg["max_epochs"] == 1000
    # baseline inferred from num_u_channels=0 strips CIF nets
    assert cfg["num_u_channels"] == 0 and not cfg["use_cond_affine"]


def test_tabular_nonsquare_latent_dims():
    # BASELINE.md: power 2, gas 2 (non-baseline), hepmass 10, miniboone 21
    for ds, d in [("power", 2), ("gas", 2), ("hepmass", 10), ("miniboone", 21)]:
        cfg = get_config(ds, "non-square", use_baseline=False)
        assert cfg["latent_dimension"] == d, ds
    cfg = get_config("gas", "non-square", use_baseline=True)
    assert cfg["latent_dimension"] == 4 and cfg["m_flow"] is True


def test_expand_grid():
    grid = expand_grid({"a": GridParams(1, 2), "b": {"c": GridParams("x", "y")}, "d": 7})
    assert len(grid) == 4
    assert {"a": 1, "b": {"c": "x"}, "d": 7} in grid
    assert all(g["d"] == 7 for g in grid)


def _smoke(config, x_shape, batch=4, check_sample=True):
    schema = get_schema(config)
    density = get_density(schema, x_shape)
    key = jax.random.PRNGKey(0)
    variables = density.init(key)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (batch, *x_shape), minval=0.05, maxval=0.95)
    info, _ = density.elbo(variables, x, rng=jax.random.fold_in(key, 2), train=True)
    assert info["elbo"].shape == (batch,)
    assert np.all(np.isfinite(np.asarray(info["elbo"]))), config.get("schema_type")
    if check_sample:
        s = density.sample(variables, jax.random.fold_in(key, 3), 3)
        assert s.shape == (3, *x_shape)
        assert np.all(np.isfinite(np.asarray(s)))
    return density, variables


@pytest.mark.parametrize("model", ["realnvp", "maf", "sos", "bnaf", "planar", "nsf-ar", "affine"])
def test_2d_square_models_build_and_run(model):
    use_baseline = model in ("affine",)
    cfg = get_config("sphere", model, use_baseline=use_baseline)
    cfg["num_valid_elbo_samples"] = 1
    # Shrink nets for test speed but keep structure
    for k in ["ar_map_hidden_channels", "coupler_hidden_channels", "g_hidden_channels"]:
        if k in cfg and isinstance(cfg[k], list):
            cfg[k] = [8] * 2
    if "num_hidden_channels" in cfg:
        cfg["num_hidden_channels"] = 16
    cfg["num_density_layers"] = min(cfg.get("num_density_layers", 2), 2)
    check_sample = model not in ("planar", "bnaf", "sos")  # forward-only flows
    _smoke(cfg, (3,), check_sample=check_sample)


def test_2d_cif_realnvp_builds():
    """CIF (ELBO density) path with cond-affine layers."""
    cfg = get_config("sphere", "realnvp", use_baseline=False)
    assert cfg["num_u_channels"] == 1 and cfg["use_cond_affine"]
    # need batch_norm True to place normalise→cond-affine? 2d group has
    # batch_norm False: cond-affines are inserted before each normalise and
    # normalise layers are then dropped — cond-affines survive.
    schema = get_schema(cfg)
    assert any(l["type"] == "cond-affine" for l in schema)
    _smoke(cfg, (3,))


def test_2d_nonsquare_builds_and_runs():
    cfg = get_config("sphere", "non-square", use_baseline=False)
    schema = get_schema(cfg)
    assert schema[0]["type"] == "non-square-head"
    assert any(l["type"] == "non-square-base" for l in schema)
    # no cond-affine in x-space stack of non-square (schemas.py:108-115)
    head_to_base = schema[: [l["type"] for l in schema].index("non-square-base")]
    assert not any(l["type"] == "cond-affine" for l in head_to_base)
    density, variables = _smoke(cfg, (3,))
    z = density.extract_latent(variables, jnp.ones((2, 3)) * 0.3)
    assert z.shape == (2, cfg["latent_dimension"])


def test_tabular_nonsquare_builds():
    cfg = get_config("power", "non-square", use_baseline=False)
    cfg["prior_num_density_layers"] = 2
    cfg["coupler_hidden_channels"] = [8] * 2
    cfg["prior_hidden_channels"] = [8] * 2
    cfg["num_density_layers"] = 2
    _smoke(cfg, (6,))


def test_tabular_square_with_batchnorm_passthrough():
    cfg = get_config("power", "realnvp", use_baseline=True)
    cfg["num_density_layers"] = 2
    cfg["coupler_hidden_channels"] = [8] * 2
    schema = get_schema(cfg)
    # momentum-1 batch-norm ⇒ passthrough-before-eval first (schemas.py:208-216)
    assert schema[0]["type"] == "passthrough-before-eval"
    assert any(l["type"] == "batch-norm" and l["momentum"] == 1.0 for l in schema)
    density, variables = _smoke(cfg, (6,), check_sample=False)
    # attach data + refresh state (the functional eval-refresh contract)
    x_train = jax.random.normal(jax.random.PRNGKey(5), (128, 6))
    variables = density.attach_data(variables, x_train)
    new_state = density.refresh_state(variables, rng=jax.random.PRNGKey(6))
    assert "density" in new_state


def test_image_multiscale_nonsquare_builds_small():
    cfg = get_config("mnist", "non-square", use_baseline=False)
    cfg["g_hidden_channels"] = [4] * 2
    cfg["prior_num_density_layers"] = 2
    cfg["prior_hidden_channels"] = [8] * 2
    cfg["latent_dimension"] = 4
    schema = get_schema(cfg)
    assert any(l["type"] == "split" and l["non_square"] for l in schema)
    density, variables = _smoke(cfg, (1, 8, 8), batch=2, check_sample=True)


def test_image_glow_builds_small():
    cfg = get_config("mnist", "glow", use_baseline=True)
    cfg["num_scales"] = 2
    cfg["num_steps_per_scale"] = 1
    cfg["g_num_hidden_channels"] = 4
    _smoke(cfg, (1, 8, 8), batch=2)
