"""Fréchet distance evaluation ("FID" / FID-like metric).

Contract: reference cmf/metrics.py:40-200 —
* reference statistics from the train loader (test loader with --test-fid);
* tabular datasets use RAW FEATURES (metrics.py:67-70) — the paper's
  "FID-like metric";
* images use InceptionV3 pool3 activations (eval/inception.py, pluggable);
* model samples are streamed in test-batch-size chunks (SampleLoader,
  metrics.py:40-61);
* Fréchet distance via scipy sqrtm with eps-jitter fallback on singular
  products (metrics.py:146-200).

TPU shape: mean/cov accumulation happens on device in fp32 (one pass,
E[x], E[xxᵀ]); only the final d×d sqrtm runs on host.
"""

import numpy as np
import jax
import jax.numpy as jnp


def activation_statistics(batches_iter, feature_fn=None):
    """Streaming mean/cov over batches. feature_fn maps a batch to (B, d)
    features (identity = raw features for tabular)."""
    n = 0
    s1 = None
    s2 = None
    for batch in batches_iter:
        feats = batch if feature_fn is None else feature_fn(batch)
        feats = feats.reshape(feats.shape[0], -1).astype(jnp.float32)
        b1 = jnp.sum(feats, axis=0)
        b2 = jnp.einsum("bi,bj->ij", feats, feats, precision=jax.lax.Precision.HIGHEST)
        s1 = b1 if s1 is None else s1 + b1
        s2 = b2 if s2 is None else s2 + b2
        n += feats.shape[0]
    mu = s1 / n
    # Unbiased covariance (np.cov default ddof=1, as the reference uses)
    cov = (s2 - n * jnp.outer(mu, mu)) / (n - 1)
    return np.asarray(mu), np.asarray(cov)


def _sqrtm_real(sigma1, sigma2):
    """sqrtm(Σ₁Σ₂) if it comes out finite and (near-)real, else None."""
    from scipy import linalg

    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        return None
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            return None
        covmean = covmean.real
    return covmean


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """(metrics.py:146-200) d² = |μ₁−μ₂|² + tr(Σ₁+Σ₂−2(Σ₁Σ₂)^½).

    The reference jitters the product with eps·I when sqrtm goes singular
    (non-finite). Near-singular products — routine when the feature dim
    approaches the sample count, e.g. proxy features over small synthetic
    sets — can instead surface as complex drift past the 1e-3 imaginary
    tolerance; treat that the same way, escalating the jitter until the
    root stabilizes (the jitter only enters the cross term, and at these
    magnitudes perturbs tr((Σ₁Σ₂)^½) by O(eps·d) — small against any FID
    worth acting on)."""
    diff = mu1 - mu2
    covmean = _sqrtm_real(sigma1, sigma2)
    used_jitter = 0.0
    for jitter in (eps, 1e-4, 1e-2):
        if covmean is not None:
            break
        offset = np.eye(sigma1.shape[0]) * jitter
        covmean = _sqrtm_real(sigma1 + offset, sigma2 + offset)
        used_jitter = jitter
    if covmean is None:
        raise ValueError("sqrtm(sigma1 @ sigma2) unstable even at jitter 1e-2")
    # Escalated jitter shifts the cross term by O(jitter·d) — comparable to
    # the near-floor readings on high-dim features — and two checkpoints
    # resolved at different jitter levels are scored on slightly different
    # scales. Make that auditable (round-4 advisor finding): warn and record
    # the level on the function itself for callers to stamp into metrics.
    frechet_distance.last_jitter = used_jitter
    if used_jitter > eps:
        import warnings

        warnings.warn(
            f"frechet_distance needed jitter {used_jitter:g} (> eps {eps:g}) to "
            f"stabilize sqrtm on a {sigma1.shape[0]}-dim covariance; the score "
            "is perturbed by O(jitter*d) — treat near-floor comparisons made "
            "at different jitter levels with care.",
            stacklevel=2,
        )
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def sample_batches(density, variables, rng, num_samples, batch_size):
    """Stream model samples in chunks (SampleLoader, metrics.py:40-61)."""
    remaining = num_samples
    while remaining > 0:
        n = min(batch_size, remaining)
        rng, sub = jax.random.split(rng)
        yield density.sample(variables, sub, n)
        remaining -= n


def get_fid_function(config, reference_loader, feature_fn=None):
    """Precompute reference stats; return fid(density, variables, rng).

    feature_fn=None ⇒ raw features (tabular). For images pass the Inception
    feature function (eval/inception.py).

    When the feature function is jax-traceable (raw features, the JAX
    Inception port, the proxy), the whole sample→features→mean/cov pipeline
    runs as ONE jitted lax.scan on device — 50k-sample FID with a single
    dispatch and no host↔device ping-pong (SURVEY.md §7 "host-side FID").
    Host-only feature functions (torch) stream batch-by-batch instead.
    """
    ref_mu, ref_cov = activation_statistics(iter(reference_loader), feature_fn)
    num_samples = config["num_fid_samples"]
    batch_size = config["test_batch_size"]
    n_batches = max(num_samples // batch_size, 1)

    # Host-only feature fns (the torchvision fallback) set jax_traceable=False
    jax_traceable = feature_fn is None or getattr(feature_fn, "jax_traceable", True)

    _fused_cache = {}

    def _fused_stats(density):
        if "fn" not in _fused_cache:

            @jax.jit
            def stats(variables, rng):
                def body(carry, _):
                    s1, s2, rng = carry
                    rng, sub = jax.random.split(rng)
                    x = density.sample(variables, sub, batch_size)
                    feats = x if feature_fn is None else feature_fn(x)
                    feats = feats.reshape(feats.shape[0], -1).astype(jnp.float32)
                    s1 = s1 + jnp.sum(feats, axis=0)
                    s2 = s2 + jnp.einsum(
                        "bi,bj->ij", feats, feats, precision=jax.lax.Precision.HIGHEST
                    )
                    return (s1, s2, rng), ()

                probe = density.sample(variables, rng, 1)
                feats0 = probe if feature_fn is None else feature_fn(probe)
                dim = int(np.prod(feats0.shape[1:]))
                init = (jnp.zeros(dim), jnp.zeros((dim, dim)), rng)
                (s1, s2, _), _ = jax.lax.scan(body, init, None, length=n_batches)
                n = n_batches * batch_size
                mu = s1 / n
                cov = (s2 - n * jnp.outer(mu, mu)) / (n - 1)
                return mu, cov

            _fused_cache["fn"] = stats
        return _fused_cache["fn"]

    def fid(density, variables, rng):
        if jax_traceable:
            mu, cov = _fused_stats(density)(variables, rng)
            mu, cov = np.asarray(mu), np.asarray(cov)
        else:
            mu, cov = activation_statistics(
                sample_batches(density, variables, rng, num_samples, batch_size),
                feature_fn,
            )
        score = frechet_distance(ref_mu, ref_cov, mu, cov)
        # Auditable alongside the score (advisor round 4): 0.0 = no jitter.
        fid.last_jitter = getattr(frechet_distance, "last_jitter", 0.0)
        return score

    # Provenance stamp for every FID written downstream (metrics.json, test
    # scalars): which extractor produced the number. Proxy FIDs are relative
    # tracking signals only — never comparable to published InceptionV3 FID.
    fid.feature_extractor = (
        "raw-features" if feature_fn is None
        else getattr(feature_fn, "extractor_kind", "unknown")
    )
    return fid
