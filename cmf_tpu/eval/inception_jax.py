"""JAX port of the FID InceptionV3 network (pool3, 2048-d features).

Contract: reference cmf/metrics.py:203-524 — the pytorch-fid InceptionV3
variant with its patched pooling blocks (count_include_pad=False average
pools, FIDInceptionA/C/E quirks), evaluated at 299×299 on inputs scaled to
[-1, 1]. This port runs the whole feature extraction on TPU.

Weights: ``convert_torch_weights(state_dict_path, out_npz)`` converts a
pytorch-fid checkpoint (pt_inception-2015-12-05) to the flat npz this module
loads; ``load_feature_fn(npz_path)`` returns the jitted feature function.
Layer naming mirrors the torch module paths so conversion is mechanical.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _conv_bn(params, name, x, stride=1, padding="SAME"):
    """Conv2d (no bias) + BatchNorm(eps=1e-3) + relu — torchvision
    BasicConv2d."""
    w = params[f"{name}.conv.weight"]
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    mean = params[f"{name}.bn.running_mean"]
    var = params[f"{name}.bn.running_var"]
    gamma = params[f"{name}.bn.weight"]
    beta = params[f"{name}.bn.bias"]
    inv = jax.lax.rsqrt(var + 1e-3)
    out = (out - mean[None, :, None, None]) * inv[None, :, None, None]
    out = out * gamma[None, :, None, None] + beta[None, :, None, None]
    return jax.nn.relu(out)


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window), (1, 1, stride, stride), "VALID"
    )


def _avg_pool_same(x, window=3):
    """3×3 stride-1 SAME average pool with count_include_pad=False — the
    pytorch-fid patch (metrics.py FIDInceptionA/C/E)."""
    ones = jnp.ones_like(x[:1, :1])
    sum_x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, (1, 1, window, window), (1, 1, 1, 1), "SAME"
    )
    del ones
    return sum_x / counts


def _inception_a(p, name, x, pool_features):
    b1 = _conv_bn(p, f"{name}.branch1x1", x)
    b5 = _conv_bn(p, f"{name}.branch5x5_1", x)
    b5 = _conv_bn(p, f"{name}.branch5x5_2", b5)
    b3 = _conv_bn(p, f"{name}.branch3x3dbl_1", x)
    b3 = _conv_bn(p, f"{name}.branch3x3dbl_2", b3)
    b3 = _conv_bn(p, f"{name}.branch3x3dbl_3", b3)
    bp = _avg_pool_same(x)
    bp = _conv_bn(p, f"{name}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, name, x):
    b3 = _conv_bn(p, f"{name}.branch3x3", x, stride=2, padding="VALID")
    bd = _conv_bn(p, f"{name}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_2", bd)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_3", bd, stride=2, padding="VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, name, x):
    b1 = _conv_bn(p, f"{name}.branch1x1", x)
    b7 = _conv_bn(p, f"{name}.branch7x7_1", x)
    b7 = _conv_bn(p, f"{name}.branch7x7_2", b7)
    b7 = _conv_bn(p, f"{name}.branch7x7_3", b7)
    bd = _conv_bn(p, f"{name}.branch7x7dbl_1", x)
    bd = _conv_bn(p, f"{name}.branch7x7dbl_2", bd)
    bd = _conv_bn(p, f"{name}.branch7x7dbl_3", bd)
    bd = _conv_bn(p, f"{name}.branch7x7dbl_4", bd)
    bd = _conv_bn(p, f"{name}.branch7x7dbl_5", bd)
    bp = _avg_pool_same(x)
    bp = _conv_bn(p, f"{name}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, name, x):
    b3 = _conv_bn(p, f"{name}.branch3x3_1", x)
    b3 = _conv_bn(p, f"{name}.branch3x3_2", b3, stride=2, padding="VALID")
    b7 = _conv_bn(p, f"{name}.branch7x7x3_1", x)
    b7 = _conv_bn(p, f"{name}.branch7x7x3_2", b7)
    b7 = _conv_bn(p, f"{name}.branch7x7x3_3", b7)
    b7 = _conv_bn(p, f"{name}.branch7x7x3_4", b7, stride=2, padding="VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, name, x, last=False):
    b1 = _conv_bn(p, f"{name}.branch1x1", x)
    b3 = _conv_bn(p, f"{name}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_conv_bn(p, f"{name}.branch3x3_2a", b3), _conv_bn(p, f"{name}.branch3x3_2b", b3)],
        axis=1,
    )
    bd = _conv_bn(p, f"{name}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{name}.branch3x3dbl_2", bd)
    bd = jnp.concatenate(
        [_conv_bn(p, f"{name}.branch3x3dbl_3a", bd), _conv_bn(p, f"{name}.branch3x3dbl_3b", bd)],
        axis=1,
    )
    if last:
        # FIDInceptionE_2: max pool instead of average (pytorch-fid quirk)
        bp = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME"
        )
    else:
        bp = _avg_pool_same(x)
    bp = _conv_bn(p, f"{name}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def inception_pool3_features(params, x):
    """x: (B, 3, 299, 299) in [-1, 1] → (B, 2048) pool3 features."""
    out = _conv_bn(params, "Conv2d_1a_3x3", x, stride=2, padding="VALID")
    out = _conv_bn(params, "Conv2d_2a_3x3", out, padding="VALID")
    out = _conv_bn(params, "Conv2d_2b_3x3", out)
    out = _max_pool(out)
    out = _conv_bn(params, "Conv2d_3b_1x1", out)
    out = _conv_bn(params, "Conv2d_4a_3x3", out, padding="VALID")
    out = _max_pool(out)
    out = _inception_a(params, "Mixed_5b", out, 32)
    out = _inception_a(params, "Mixed_5c", out, 64)
    out = _inception_a(params, "Mixed_5d", out, 64)
    out = _inception_b(params, "Mixed_6a", out)
    out = _inception_c(params, "Mixed_6b", out)
    out = _inception_c(params, "Mixed_6c", out)
    out = _inception_c(params, "Mixed_6d", out)
    out = _inception_c(params, "Mixed_6e", out)
    out = _inception_d(params, "Mixed_7a", out)
    out = _inception_e(params, "Mixed_7b", out)
    out = _inception_e(params, "Mixed_7c", out, last=True)
    return jnp.mean(out, axis=(2, 3))  # global average pool → (B, 2048)


def _resize_bilinear(x, size=299):
    """Bilinear resize NCHW → (B, C, size, size) (torch F.interpolate
    align_corners=False equivalent via jax.image)."""
    b, c = x.shape[:2]
    return jax.image.resize(x, (b, c, size, size), method="bilinear")


def load_feature_fn(npz_path):
    raw = np.load(npz_path)
    validate_params({k: raw[k] for k in raw.files})
    params = {k: jnp.asarray(raw[k]) for k in raw.files}

    @jax.jit
    def features(x):
        # x: (B, C, H, W) uint8-range floats [0, 256)
        x = x / 255.0
        if x.shape[1] == 1:
            x = jnp.tile(x, (1, 3, 1, 1))
        x = _resize_bilinear(x)
        x = 2.0 * x - 1.0
        return inception_pool3_features(params, x)

    features.extractor_kind = "inception-jax"
    return features


def convert_torch_weights(state_dict_path, out_npz):
    """Convert a pytorch-fid InceptionV3 state_dict (.pth) to npz."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    arrays = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or k.startswith(("AuxLogits", "fc")):
            continue
        arrays[k] = v.numpy()
    validate_params(arrays)
    np.savez(out_npz, **arrays)
    return out_npz


def state_dict_spec():
    """Every feature-path state_dict key → shape for the pytorch-fid
    InceptionV3 (torchvision channel plan; AuxLogits/fc excluded, exactly the
    keys ``inception_pool3_features`` reads). Used to validate converted
    weights up front and to generate deterministic full-architecture fixtures
    without torchvision or the 91 MB pinned checkpoint
    (ref metrics.py:208 pt_inception-2015-12-05)."""
    from collections import OrderedDict

    spec = OrderedDict()

    def cb(name, o, i, kh, kw):
        spec[f"{name}.conv.weight"] = (o, i, kh, kw)
        for suf in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{name}.bn.{suf}"] = (o,)

    # Stem
    cb("Conv2d_1a_3x3", 32, 3, 3, 3)
    cb("Conv2d_2a_3x3", 32, 32, 3, 3)
    cb("Conv2d_2b_3x3", 64, 32, 3, 3)
    cb("Conv2d_3b_1x1", 80, 64, 1, 1)
    cb("Conv2d_4a_3x3", 192, 80, 3, 3)

    # InceptionA (in_ch, pool_features): out = 64+64+96+pool
    for name, in_ch, pool in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                              ("Mixed_5d", 288, 64)):
        cb(f"{name}.branch1x1", 64, in_ch, 1, 1)
        cb(f"{name}.branch5x5_1", 48, in_ch, 1, 1)
        cb(f"{name}.branch5x5_2", 64, 48, 5, 5)
        cb(f"{name}.branch3x3dbl_1", 64, in_ch, 1, 1)
        cb(f"{name}.branch3x3dbl_2", 96, 64, 3, 3)
        cb(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        cb(f"{name}.branch_pool", pool, in_ch, 1, 1)

    # InceptionB: 288 → 384 + 96 + 288 = 768
    cb("Mixed_6a.branch3x3", 384, 288, 3, 3)
    cb("Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    cb("Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    cb("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    # InceptionC (c7 mid-width): 768 → 768
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                     ("Mixed_6e", 192)):
        cb(f"{name}.branch1x1", 192, 768, 1, 1)
        cb(f"{name}.branch7x7_1", c7, 768, 1, 1)
        cb(f"{name}.branch7x7_2", c7, c7, 1, 7)
        cb(f"{name}.branch7x7_3", 192, c7, 7, 1)
        cb(f"{name}.branch7x7dbl_1", c7, 768, 1, 1)
        cb(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        cb(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        cb(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        cb(f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
        cb(f"{name}.branch_pool", 192, 768, 1, 1)

    # InceptionD: 768 → 320 + 192 + 768 = 1280
    cb("Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    cb("Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    cb("Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    cb("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    cb("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    cb("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    # InceptionE: → 320 + 768 + 768 + 192 = 2048
    for name, in_ch in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        cb(f"{name}.branch1x1", 320, in_ch, 1, 1)
        cb(f"{name}.branch3x3_1", 384, in_ch, 1, 1)
        cb(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        cb(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        cb(f"{name}.branch3x3dbl_1", 448, in_ch, 1, 1)
        cb(f"{name}.branch3x3dbl_2", 384, 448, 3, 3)
        cb(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        cb(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        cb(f"{name}.branch_pool", 192, in_ch, 1, 1)

    return spec


def validate_params(arrays):
    """Assert a converted weight dict covers the feature path exactly —
    loud, named errors instead of a KeyError mid-jit on the first real-data
    FID run (round-3 verdict item 6)."""
    spec = state_dict_spec()
    missing = [k for k in spec if k not in arrays]
    extra = [k for k in arrays if k not in spec]
    if missing or extra:
        raise ValueError(
            "InceptionV3 weight mismatch: "
            f"missing {missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"({len(missing)} total), unexpected "
            f"{extra[:5]}{'...' if len(extra) > 5 else ''} ({len(extra)} total)"
        )
    bad = [
        (k, tuple(np.shape(arrays[k])), spec[k])
        for k in spec
        if tuple(np.shape(arrays[k])) != spec[k]
    ]
    if bad:
        raise ValueError(f"InceptionV3 weight shape mismatches: {bad[:5]}")


def random_state_dict(seed=0):
    """Deterministic full-architecture state_dict (numpy, torch naming) for
    the golden pipeline fixture: He-scaled conv weights and moderate BN
    statistics keep activations finite through all 94 conv+bn layers."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in state_dict_spec().items():
        if k.endswith(".conv.weight"):
            fan_in = shape[1] * shape[2] * shape[3]
            sd[k] = rng.normal(0, fan_in ** -0.5, shape).astype(np.float32)
        elif k.endswith(".bn.weight"):
            sd[k] = rng.uniform(0.8, 1.2, shape).astype(np.float32)
        elif k.endswith(".bn.bias"):
            sd[k] = rng.normal(0, 0.05, shape).astype(np.float32)
        elif k.endswith(".bn.running_mean"):
            sd[k] = rng.normal(0, 0.1, shape).astype(np.float32)
        else:  # running_var
            sd[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
    return sd
