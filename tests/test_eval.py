"""Eval-layer tests: importance-sampled metrics, Fréchet distance, FID
plumbing, pullback correctness, metric-analysis quantities."""

import numpy as np
import jax
import jax.numpy as jnp

from cmf_tpu.densities import BijectionDensity, DiagonalGaussianDensity
from cmf_tpu.bijections import AffineBijection
from cmf_tpu.eval import activation_statistics, frechet_distance, metrics
from cmf_tpu.eval.fid import get_fid_function, sample_batches
from tests.test_nonsquare import build_nonsquare


def _gaussian_density(d=4):
    density = BijectionDensity(
        bijection=AffineBijection((d,), per_channel=False),
        prior=DiagonalGaussianDensity((d,), num_fixed_samples=4),
    )
    return density, density.init(jax.random.PRNGKey(0))


def test_metrics_log_prob_exact_for_deterministic_density(rng):
    """For an exact density, log-prob == elbo independent of K and matches
    the closed form (metrics.py:17-37)."""
    density, variables = _gaussian_density()
    x = jax.random.normal(rng, (16, 4))
    out = metrics(density, variables, x, num_elbo_samples=7, rng=rng)
    np.testing.assert_allclose(np.asarray(out["elbo"]), np.asarray(out["log-prob"]), rtol=1e-5)
    # affine is identity-initialised → standard normal log-prob
    expected = -0.5 * np.sum(np.asarray(x) ** 2, axis=1) - 2 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(out["log-prob"]), expected, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["bpd"]), -expected / 4 / np.log(2), rtol=1e-4
    )


def test_metrics_scan_matches_per_sample_logsumexp(rng):
    """The streaming scan-over-K (metrics.py) must equal the direct
    logsumexp over K independently-seeded elbo evaluations — without ever
    materialising the (K·B, D) repeated batch of the reference
    (metrics.py:17-37)."""
    from cmf_tpu.densities import DequantizationDensity

    inner, _ = _gaussian_density()
    density = DequantizationDensity(inner)  # rng-dependent elbo at eval time
    variables = density.init(jax.random.PRNGKey(0))
    x = jnp.floor(jax.random.uniform(jax.random.fold_in(rng, 1), (5, 4)) * 8)
    K = 6
    out = metrics(density, variables, x, num_elbo_samples=K, rng=rng)

    keys = jax.random.split(rng, K)
    samples = np.stack(
        [np.asarray(density.elbo(variables, x, rng=k, train=False)[0]["elbo"]) for k in keys]
    )  # (K, B)
    assert np.std(samples, axis=0).max() > 1e-4  # genuinely stochastic
    expected_lp = jax.scipy.special.logsumexp(jnp.asarray(samples), axis=0) - np.log(K)
    np.testing.assert_allclose(np.asarray(out["log-prob"]), np.asarray(expected_lp), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["elbo"]), samples.mean(0), rtol=1e-5)


def test_frechet_distance_properties(rng):
    mu = np.zeros(5)
    sigma = np.eye(5)
    assert frechet_distance(mu, sigma, mu, sigma) < 1e-8
    mu2 = np.ones(5)
    d = frechet_distance(mu, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 5.0, rtol=1e-6)  # |μ₁−μ₂|² with equal Σ


def test_activation_statistics_match_numpy(rng):
    data = np.asarray(jax.random.normal(rng, (500, 6)))
    batches = [jnp.asarray(data[i : i + 100]) for i in range(0, 500, 100)]
    mu, cov = activation_statistics(iter(batches))
    np.testing.assert_allclose(mu, data.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(data, rowvar=False), rtol=1e-3, atol=1e-4)


def test_fid_function_end_to_end(rng):
    """Raw-feature FID of a model against its own samples ≈ small; against a
    shifted reference ≫ (the tabular FID-like metric, metrics.py:67-70)."""
    density, variables = _gaussian_density()
    config = {"num_fid_samples": 2000, "test_batch_size": 500}
    ref_batches = list(sample_batches(density, variables, jax.random.PRNGKey(5), 2000, 500))
    fid_fn = get_fid_function(config, ref_batches)
    val_self = fid_fn(density, variables, jax.random.PRNGKey(7))
    assert val_self < 0.1

    shifted = [b + 3.0 for b in ref_batches]
    fid_shift = get_fid_function(config, shifted)
    assert fid_shift(density, variables, jax.random.PRNGKey(7)) > 10.0


def test_pullback_matches_autodiff(rng):
    """pullback log(J_enc J_encᵀ) for 1-D latents vs direct jacobian
    (non_square.py:331-338)."""
    head, variables = build_nonsquare(D=3, d=1, key=rng)
    x = jax.random.normal(jax.random.fold_in(rng, 5), (4, 3))
    got = np.asarray(head.pullback_log_jac_jac_transpose(variables, x))

    pv = {"params": variables["params"]["prior"], "state": variables["state"]["prior"]}

    def enc(xi):
        info, _ = head.prior.elbo(pv, xi[None], rng=None, train=False)
        return info["low_dim_x"][0, 0]

    for i in range(4):
        jac = np.asarray(jax.grad(enc)(x[i]))
        np.testing.assert_allclose(got[i], np.log((jac**2).sum()), rtol=1e-4)


def test_macs_orthogonal_is_zero(rng):
    """MACS of an exactly-orthogonal decoder Jacobian must be 0 (the tail's
    zero-pad decoder is orthogonal by construction)."""
    from cmf_tpu.densities import NonSquareTailDensity
    from cmf_tpu.viz.metric_analysis import macs

    tail = NonSquareTailDensity(
        prior=DiagonalGaussianDensity((3,)), x_shape=(6,), latent_dimension=3,
        detach_before_prior=False,
    )
    variables = tail.init(rng)
    z = jax.random.normal(rng, (8, 3))
    val, cos = macs(tail, variables, z)
    assert val < 1e-6
    np.testing.assert_allclose(np.diag(cos), 1.0, atol=1e-5)


def test_inception_proxy_features_deterministic():
    from cmf_tpu.eval.inception import _proxy_feature_fn

    f = _proxy_feature_fn(fid_dims=256)
    x = jnp.ones((2, 1, 28, 28)) * 128.0
    a, b = f(x), f(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape[0] == 2 and a.shape[1] > 0
