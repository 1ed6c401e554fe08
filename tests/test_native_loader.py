"""Native gather+cast kernel: correctness vs numpy, threading, loader
integration, and a build-or-fallback guarantee."""

import time

import numpy as np
import pytest

from cmf_tpu.data.native import gather_cast, get_lib
from cmf_tpu.data.loaders import ArrayLoader


def test_gather_cast_u8_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (1000, 3, 8, 8), dtype=np.uint8)
    idx = rng.permutation(1000)[:256]
    out = gather_cast(src, idx, scale=1 / 256.0)
    expected = src[idx].astype(np.float32) / 256.0
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_gather_cast_f32_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((500, 43)).astype(np.float32)
    idx = rng.permutation(500)[:400]
    out = gather_cast(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_cast_shift():
    src = np.full((10, 4), 128, dtype=np.uint8)
    out = gather_cast(src, np.arange(10), scale=1 / 256.0, shift=-0.5)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_native_lib_builds():
    """The toolchain is baked into the image — the .so must actually build
    (fallback is for deploy targets without g++)."""
    assert get_lib() is not None


def test_native_faster_than_numpy_on_large_gather():
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, (20000, 3 * 32 * 32), dtype=np.uint8)
    idx = rng.permutation(20000)

    t0 = time.perf_counter()
    expected = src[idx].astype(np.float32) * (1 / 256.0)
    t_numpy = time.perf_counter() - t0

    gather_cast(src, idx[:64], scale=1 / 256.0)  # warm the lib
    t0 = time.perf_counter()
    out = gather_cast(src, idx, scale=1 / 256.0)
    t_native = time.perf_counter() - t0

    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # Threaded fused pass should not be slower; usually 2-8x faster.
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)


def test_loader_host_resident_uint8_epoch():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (512, 1, 8, 8), dtype=np.uint8)
    loader = ArrayLoader(x, batch_size=64, shuffle=True, drop_last=True, seed=5)
    assert loader._host_resident()
    batches = loader.epoch_batches()
    assert batches.shape == (8, 64, 1, 8, 8)
    assert str(batches.dtype) == "float32"
    # Same seed/epoch ⇒ deterministic content
    loader2 = ArrayLoader(x, batch_size=64, shuffle=True, drop_last=True, seed=5)
    np.testing.assert_array_equal(np.asarray(batches), np.asarray(loader2.epoch_batches()))
