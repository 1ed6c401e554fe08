"""Image feature extractor for FID.

Contract: reference cmf/metrics.py:203-524 ports the pytorch-fid InceptionV3
(pool3, 2048-d) with weights fetched from a release URL (metrics.py:208).
On an air-gapped TPU host those weights may be unavailable, so the feature
function is resolved in order:

1. ``CMF_TPU_INCEPTION_WEIGHTS`` — a local .npz of InceptionV3 parameters, run
   through the JAX port below;
2. torchvision's locally cached ``inception_v3`` weights (CPU torch, used
   feature-extraction-only, exactly the pytorch-fid graph);
3. a deterministic random-conv feature extractor ("proxy FID") — useful for
   relative tracking during training; clearly labelled, never comparable to
   published FID numbers.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

_WARNED = False


def _proxy_feature_fn(fid_dims=2048, seed=0):
    """Deterministic random 3-layer conv features. Random-projection FID is a
    valid two-sample discrepancy (distinct distributions ⇒ distinct stats)
    but is NOT InceptionV3 FID."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (32, 3, 5, 5)) * 0.2
    w2 = jax.random.normal(k2, (64, 32, 3, 3)) * 0.2
    w3 = jax.random.normal(k3, (fid_dims // 16, 64, 3, 3)) * 0.2

    @jax.jit
    def features(x):
        # x: (B, C, H, W) in [0, 256); normalise to [-1, 1]
        x = x / 128.0 - 1.0
        if x.shape[1] == 1:
            x = jnp.tile(x, (1, 3, 1, 1))

        def conv(h, w, stride):
            return jax.lax.conv_general_dilated(
                h, w, (stride, stride), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        h = jax.nn.relu(conv(x, w1, 2))
        h = jax.nn.relu(conv(h, w2, 2))
        h = jax.nn.relu(conv(h, w3, 2))
        # 4×4 spatial average-pool grid → fid_dims features
        b, c, hh, ww = h.shape
        gh, gw = max(hh // 2, 1), max(ww // 2, 1)
        h = h[:, :, : gh * 2, : gw * 2].reshape(b, c, 2, gh, 2, gw).mean((3, 5))
        return h.reshape(b, -1)

    features.extractor_kind = "proxy"
    return features


def _torchvision_feature_fn():
    """pytorch-fid-equivalent pool3 features via locally cached torchvision
    weights (CPU); raises if weights are not on disk."""
    import torch
    import torchvision

    model = torchvision.models.inception_v3(
        weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1,
        aux_logits=True,
    )
    model.fc = torch.nn.Identity()
    model.eval()

    def features(x):
        arr = np.asarray(x) / 255.0
        t = torch.tensor(arr, dtype=torch.float32)
        if t.shape[1] == 1:
            t = t.repeat(1, 3, 1, 1)
        t = torch.nn.functional.interpolate(t, size=(299, 299), mode="bilinear", align_corners=False)
        t = (t - 0.5) / 0.5
        with torch.no_grad():
            out = model(t)
        return jnp.asarray(out.numpy())

    features.jax_traceable = False
    features.extractor_kind = "torchvision"
    return features


def get_feature_fn(config):
    global _WARNED
    weights_path = os.environ.get("CMF_TPU_INCEPTION_WEIGHTS")
    if weights_path and os.path.exists(weights_path):
        from .inception_jax import load_feature_fn

        return load_feature_fn(weights_path)
    try:
        return _torchvision_feature_fn()
    except Exception:
        if not _WARNED:
            print(
                "WARNING: InceptionV3 weights unavailable — falling back to a "
                "deterministic random-conv proxy. FID values are relative "
                "tracking signals, not comparable to published numbers."
            )
            _WARNED = True
        return _proxy_feature_fn(config.get("fid_dims", 2048))
