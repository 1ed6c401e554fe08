"""Eval-layer tests: importance-sampled metrics, Fréchet distance, FID
plumbing, pullback correctness, metric-analysis quantities."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_frechet_distance_near_singular_complex_drift():
    """Rank-deficient covariances (fewer samples than feature dims — routine
    for proxy features over small synthetic sets) can make scipy sqrtm drift
    complex past the 1e-3 imaginary tolerance without ever going non-finite;
    frechet_distance must resolve them via the escalating jitter instead of
    raising (observed live: the proxy-FID probe's 512-dim features over 1500
    synthetic-mnist images)."""
    r = np.random.default_rng(0)
    d, n, scale = 128, 40, 30.0
    a = r.normal(size=(n, d)) * scale
    b = r.normal(size=(n, d)) * scale * 1.2 + scale * 0.05
    s1 = np.cov(a, rowvar=False)
    s2 = np.cov(b, rowvar=False)
    fd = frechet_distance(a.mean(0), s1, b.mean(0), s2)
    assert np.isfinite(fd)
    # Same-distribution control at the same rank deficiency stays far below
    # the cross-distribution distance.
    c = r.normal(size=(n, d)) * scale
    fd_same = frechet_distance(a.mean(0), s1, c.mean(0), np.cov(c, rowvar=False))
    assert np.isfinite(fd_same) and fd_same < fd


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


def test_inception_jax_matches_patched_torch_graph():
    """Feature parity of the JAX InceptionV3 port (eval/inception_jax.py)
    against the pytorch-fid graph it mirrors (reference metrics.py:203-524),
    on RANDOM weights and randomized batch-norm statistics — pins convs,
    batch-norm eps=1e-3, the count_include_pad=False average pools of the
    patched A/C/E blocks and the max-pool quirk of the final E block."""
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    import torch.nn.functional as F

    from cmf_tpu.eval.inception_jax import inception_pool3_features

    torch.manual_seed(0)
    model = torchvision.models.inception_v3(weights=None, aux_logits=True, init_weights=True)
    model.eval()
    with torch.no_grad():  # exercise non-trivial BN running stats
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    params = {
        k: jnp.asarray(v.numpy())
        for k, v in model.state_dict().items()
        if not k.endswith("num_batches_tracked") and not k.startswith(("AuxLogits", "fc"))
    }
    x = np.clip(
        np.random.default_rng(0).normal(size=(2, 3, 299, 299)), -1, 1
    ).astype(np.float32)

    # pytorch-fid's patched block forwards, re-derived from their documented
    # deltas vs torchvision: count_include_pad=False average pools in A/C/E,
    # and a 3x3 stride-1 max pool in the last E block.
    def patched_a(m, t):
        b1 = m.branch1x1(t)
        b5 = m.branch5x5_2(m.branch5x5_1(t))
        bd = m.branch3x3dbl_3(m.branch3x3dbl_2(m.branch3x3dbl_1(t)))
        bp = m.branch_pool(F.avg_pool2d(t, 3, 1, 1, count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)

    def patched_c(m, t):
        b1 = m.branch1x1(t)
        b7 = m.branch7x7_3(m.branch7x7_2(m.branch7x7_1(t)))
        bd = m.branch7x7dbl_5(
            m.branch7x7dbl_4(m.branch7x7dbl_3(m.branch7x7dbl_2(m.branch7x7dbl_1(t))))
        )
        bp = m.branch_pool(F.avg_pool2d(t, 3, 1, 1, count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)

    def patched_e(m, t, last):
        b1 = m.branch1x1(t)
        b3 = m.branch3x3_1(t)
        b3 = torch.cat([m.branch3x3_2a(b3), m.branch3x3_2b(b3)], 1)
        bd = m.branch3x3dbl_2(m.branch3x3dbl_1(t))
        bd = torch.cat([m.branch3x3dbl_3a(bd), m.branch3x3dbl_3b(bd)], 1)
        pool = (
            F.max_pool2d(t, 3, 1, 1)
            if last
            else F.avg_pool2d(t, 3, 1, 1, count_include_pad=False)
        )
        return torch.cat([b1, b3, bd, m.branch_pool(pool)], 1)

    with torch.no_grad():
        t = torch.tensor(x)
        m = model
        t = m.Conv2d_1a_3x3(t)
        t = m.Conv2d_2a_3x3(t)
        t = m.Conv2d_2b_3x3(t)
        t = F.max_pool2d(t, 3, 2)
        t = m.Conv2d_3b_1x1(t)
        t = m.Conv2d_4a_3x3(t)
        t = F.max_pool2d(t, 3, 2)
        t = patched_a(m.Mixed_5b, t)
        t = patched_a(m.Mixed_5c, t)
        t = patched_a(m.Mixed_5d, t)
        t = m.Mixed_6a(t)
        t = patched_c(m.Mixed_6b, t)
        t = patched_c(m.Mixed_6c, t)
        t = patched_c(m.Mixed_6d, t)
        t = patched_c(m.Mixed_6e, t)
        t = m.Mixed_7a(t)
        t = patched_e(m.Mixed_7b, t, last=False)
        t = patched_e(m.Mixed_7c, t, last=True)
        expected = F.adaptive_avg_pool2d(t, (1, 1)).flatten(1).numpy()

    got = np.asarray(inception_pool3_features(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=5e-3, atol=5e-3)


def test_inception_jax_primitives_match_torch():
    """In-container parity for the port's building blocks against pure torch
    (torchvision-free): conv+BN(eps=1e-3)+relu, the count_include_pad=False
    SAME average pool, the 3x3/2 VALID max pool, and bilinear resize — the
    places a porting bug would hide."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from cmf_tpu.eval.inception_jax import (
        _avg_pool_same,
        _conv_bn,
        _max_pool,
        _resize_bilinear,
    )

    g = np.random.default_rng(1)
    x = g.normal(size=(2, 5, 17, 17)).astype(np.float32)
    w = (g.normal(size=(7, 5, 3, 3)) * 0.1).astype(np.float32)
    params = {
        "blk.conv.weight": jnp.asarray(w),
        "blk.bn.running_mean": jnp.asarray(g.normal(size=7).astype(np.float32) * 0.1),
        "blk.bn.running_var": jnp.asarray(g.uniform(0.5, 1.5, size=7).astype(np.float32)),
        "blk.bn.weight": jnp.asarray(g.normal(size=7).astype(np.float32)),
        "blk.bn.bias": jnp.asarray(g.normal(size=7).astype(np.float32)),
    }
    with torch.no_grad():
        t = torch.tensor(x)
        conv = F.conv2d(t, torch.tensor(w), padding=1)
        bn = F.batch_norm(
            conv,
            torch.tensor(np.asarray(params["blk.bn.running_mean"])),
            torch.tensor(np.asarray(params["blk.bn.running_var"])),
            torch.tensor(np.asarray(params["blk.bn.weight"])),
            torch.tensor(np.asarray(params["blk.bn.bias"])),
            training=False, eps=1e-3,
        )
        expected_cb = F.relu(bn).numpy()
        expected_avg = F.avg_pool2d(t, 3, 1, 1, count_include_pad=False).numpy()
        expected_max = F.max_pool2d(t, 3, 2).numpy()
        expected_rs = F.interpolate(t, size=(29, 29), mode="bilinear", align_corners=False).numpy()

    np.testing.assert_allclose(
        np.asarray(_conv_bn(params, "blk", jnp.asarray(x))), expected_cb, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(_avg_pool_same(jnp.asarray(x))), expected_avg, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_max_pool(jnp.asarray(x))), expected_max, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_resize_bilinear(jnp.asarray(x), 29)), expected_rs, rtol=1e-4, atol=1e-5
    )


def test_fid_function_stamps_extractor(rng):
    """Every fid function carries feature_extractor provenance (VERDICT r2
    #6); raw tabular features stamp 'raw-features', the proxy stamps
    'proxy'."""
    from cmf_tpu.eval.inception import _proxy_feature_fn

    density, variables = _gaussian_density()
    config = {"num_fid_samples": 100, "test_batch_size": 50}
    ref = list(sample_batches(density, variables, jax.random.PRNGKey(5), 100, 50))
    assert get_fid_function(config, ref).feature_extractor == "raw-features"
    proxy = _proxy_feature_fn(fid_dims=64)
    assert proxy.extractor_kind == "proxy"


def test_inception_proxy_features_deterministic():
    from cmf_tpu.eval.inception import _proxy_feature_fn

    f = _proxy_feature_fn(fid_dims=256)
    x = jnp.ones((2, 1, 28, 28)) * 128.0
    a, b = f(x), f(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape[0] == 2 and a.shape[1] > 0


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_inception_weight_pipeline_golden(tmp_path):
    """Golden-value the FULL published-comparable FID weight path (round-3
    verdict item 6): a deterministic full-architecture state_dict flows
    through torch.save → convert_torch_weights → load_feature_fn →
    preprocess (uint8 grayscale → tile → 299 resize → [-1,1]) → pool3, and
    the (4, 2048) features must match the committed golden within float
    tolerance. A machine with the real pt_inception-2015-12-05 weights
    (ref metrics.py:208) exercises the identical code path."""
    import torch

    from cmf_tpu.eval.inception_jax import (
        convert_torch_weights,
        load_feature_fn,
        random_state_dict,
    )

    sd = {k: torch.from_numpy(v) for k, v in random_state_dict(0).items()}
    pth = str(tmp_path / "inception_fixture.pth")
    npz = str(tmp_path / "inception_fixture.npz")
    torch.save(sd, pth)
    convert_torch_weights(pth, npz)

    feats_fn = load_feature_fn(npz)
    x = np.random.default_rng(42).integers(0, 256, (4, 1, 28, 28)).astype(np.float32)
    got = np.asarray(feats_fn(x))
    golden = np.load(os.path.join(GOLDEN_DIR, "inception_pipeline_golden.npz"))["features"]
    assert got.shape == (4, 2048)
    np.testing.assert_allclose(got, golden, rtol=2e-3, atol=2e-3)


def test_inception_validate_params_rejects_bad_dicts():
    from cmf_tpu.eval.inception_jax import random_state_dict, validate_params

    sd = random_state_dict(0)
    validate_params(sd)  # full dict passes
    import pytest

    missing = dict(sd)
    missing.pop("Mixed_7c.branch_pool.conv.weight")
    with pytest.raises(ValueError, match="missing"):
        validate_params(missing)
    bad_shape = dict(sd)
    bad_shape["Conv2d_1a_3x3.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape"):
        validate_params(bad_shape)


@pytest.mark.slow
def test_inception_real_weights_end_to_end(tmp_path):
    """Auto-runs when CMF_TPU_INCEPTION_WEIGHTS points at the pinned
    pt_inception-2015-12-05 weights (.pth or converted .npz): validates the
    key/shape spec, runs the full pipeline, and sanity-checks the features
    (finite, non-degenerate across images)."""
    path = os.environ.get("CMF_TPU_INCEPTION_WEIGHTS")
    if not path or not os.path.exists(path):
        pytest.skip("CMF_TPU_INCEPTION_WEIGHTS not set")
    from cmf_tpu.eval.inception_jax import convert_torch_weights, load_feature_fn

    if path.endswith((".pth", ".pt")):
        npz = str(tmp_path / "real_inception.npz")
        convert_torch_weights(path, npz)
    else:
        npz = path
    feats_fn = load_feature_fn(npz)
    x = np.random.default_rng(7).integers(0, 256, (4, 1, 28, 28)).astype(np.float32)
    f = np.asarray(feats_fn(x))
    assert f.shape == (4, 2048) and np.isfinite(f).all()
    # pool3 features of distinct images must differ (weights actually loaded)
    assert np.std(f, axis=0).max() > 1e-4
