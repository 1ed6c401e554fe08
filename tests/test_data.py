"""Data layer tests: every 2-D generator produces finite samples of the right
dimension; loaders batch/shuffle/drop-last correctly; synthetic tabular/image
fallbacks have the real shapes."""

import numpy as np
import pytest

from cmf_tpu.data import get_2d_data, get_2d_datasets, get_loaders, get_tabular_datasets
from cmf_tpu.data.image import get_image_datasets
from cmf_tpu.data.two_d import _GENERATORS
from cmf_tpu.config.defaults.two_d import DATASETS_2D

_EXPECTED_DIMS = {
    "sphere": 3, "offcenter-sphere": 3, "offcenter-spheres": 3, "3d-line": 3,
    "linein3d": 3, "von-mises-circle": 2, "3d-von-mises-circle": 3,
    "hyperboloid": 3, "moebius": 3, "torus": 3, "swissroll": 2,
    "s4inr6": 6, "s2inr6": 6, "trivial-s2inr6": 6, "trivial-s2inr4": 4,
    "randomized-s2inr4": 4, "fuzzy-line-in-r4": 4, "4d-fuzzy-line-in-r4": 4,
    "sinusoid-1-6": 6, "sinusoid-1-3": 3, "hemisphere-2-6": 6,
    "randomized-s2inr6": 6, "null6d": 6,
}


def test_all_registered_datasets_covered():
    """Every dataset the config group declares must have a generator."""
    missing = [d for d in DATASETS_2D if d not in _GENERATORS]
    assert not missing, f"generators missing for {missing}"


@pytest.mark.parametrize("name", DATASETS_2D)
def test_2d_generator(name):
    data = get_2d_data(name, 256, seed=3)
    assert data.shape[0] == 256
    assert data.dtype == np.float32
    assert np.all(np.isfinite(data))
    expected_dim = _EXPECTED_DIMS.get(name, 2 if name not in _EXPECTED_DIMS else None)
    if name in _EXPECTED_DIMS:
        assert data.shape[1] == _EXPECTED_DIMS[name], name
    if name.startswith("randomized-s2inr6") or name == "null6d":
        assert data.shape[1] == 6


@pytest.mark.parametrize(
    "name,dim",
    [("circles", 2), ("cos", 2), ("pinwheel", 2), ("sawtooth", 2),
     ("quadspline", 2), ("von-mises-sphere", 3)],
)
def test_generator_only_datasets(name, dim):
    """Generators the reference exposes via get_2d_data but does not list in
    its config group (reference two_d.py:120,174,266,355,364,386)."""
    data = get_2d_data(name, 255, seed=7)
    assert data.shape == (255, dim)
    assert np.all(np.isfinite(data))


def test_circles_radii():
    data = get_2d_data("circles", 2000, seed=0)
    r = np.linalg.norm(data, axis=1)
    # two rings at radius 3 and 1.5 (factor .5, scaled ×3) + noise 0.08·3
    inner = r[r < 2.25]
    outer = r[r >= 2.25]
    assert abs(np.mean(outer) - 3.0) < 0.1
    assert abs(np.mean(inner) - 1.5) < 0.1


def test_sawtooth_quadspline_support():
    for name in ("sawtooth", "quadspline"):
        data = get_2d_data(name, 4000, seed=1)
        assert np.all(np.abs(data[:, 0]) >= 1 - 1e-6) if name == "sawtooth" else True
        assert np.all((data[:, 1] >= 0) & (data[:, 1] <= 1))
        assert np.all(np.abs(data[:, 0]) <= 2 + 1e-6)


def test_von_mises_sphere_on_unit_sphere():
    data = get_2d_data("von-mises-sphere", 512, seed=2)
    np.testing.assert_allclose(np.linalg.norm(data, axis=1), 1.0, atol=1e-5)
    # identical distribution to the 3d-von-mises-circle alias
    alias = get_2d_data("3d-von-mises-circle", 512, seed=2)
    np.testing.assert_allclose(data, alias)


def test_sphere_on_unit_sphere():
    data = get_2d_data("sphere", 1000, seed=0)
    radii = np.linalg.norm(data, axis=1)
    np.testing.assert_allclose(radii, 1.0, atol=1e-5)


def test_von_mises_concentrated_at_north():
    data = get_2d_data("von-mises-circle", 4000, seed=0)
    # mode at theta=pi/2 ⇒ mean y > 0
    assert data[:, 1].mean() > 0.2


def test_split_sizes():
    train, valid, test = get_2d_datasets("fuzzy-line")
    assert train.shape[0] == 10000 and valid.shape[0] == 1000 and test.shape[0] == 5000


def test_determinism():
    a = get_2d_data("sphere", 100, seed=7)
    b = get_2d_data("sphere", 100, seed=7)
    np.testing.assert_array_equal(a, b)
    c = get_2d_data("sphere", 100, seed=8)
    assert not np.array_equal(a, c)


def test_synthetic_tabular_shapes():
    for name, dim in [("power", 6), ("miniboone", 43), ("hepmass", 21)]:
        train, valid, test = get_tabular_datasets(name, synthetic=True)
        assert train.shape[1] == dim
        assert train.dtype == np.float32
        # 10%/10% splits of the generated pool
        assert valid.shape[0] > 0 and test.shape[0] > 0


def test_synthetic_image_shapes():
    (tr_x, tr_y), (va_x, _), (te_x, _) = get_image_datasets("mnist", synthetic=True)
    assert tr_x.dtype == np.uint8
    assert tr_x.shape[1:] == (1, 28, 28)
    assert va_x.shape[0] == int(0.1 * (tr_x.shape[0] + va_x.shape[0]))


def test_loader_batching():
    cfg = {"train_batch_size": 128, "valid_batch_size": 64, "test_batch_size": 256}
    train, valid, test = get_loaders("sphere", cfg, seed=0)
    batches = list(train)
    assert all(b.shape == (128, 3) for b in batches)
    assert len(batches) == 10000 // 128  # drop_last
    # shuffling differs across epochs
    b0 = np.asarray(next(iter(train)))
    b1 = np.asarray(next(iter(train)))
    assert not np.array_equal(b0, b1)
    # eval loaders cover everything
    total = sum(b.shape[0] for b in test)
    assert total == 5000
