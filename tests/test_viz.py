"""Visualizer smoke tests: every class renders without error on tiny models
(the reference has no tests for its 2.4k-line visualizer; we at least assert
each battery runs and writes its artifacts)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmf_tpu.training.writer import Writer
from cmf_tpu.viz import get_visualizer
from cmf_tpu.viz.metric_analysis import (
    discrete_curvature,
    volume_distortion,
    winding_number,
)
from tests.test_nonsquare import build_nonsquare


@pytest.fixture
def writer(tmp_path):
    return Writer(logdir=str(tmp_path), make_subdir=False, tee=False)


def test_winding_and_curvature_circle():
    theta = np.linspace(0, 2 * np.pi, 200)
    circle = np.stack([np.cos(theta), np.sin(theta)], 1)
    assert abs(winding_number(circle) - 1.0) < 0.02
    # circle of radius 1 has curvature 1
    assert abs(discrete_curvature(circle) - 1.0) < 0.05


def test_volume_distortion_orthogonal_tail(rng):
    from cmf_tpu.densities import DiagonalGaussianDensity, NonSquareTailDensity

    tail = NonSquareTailDensity(
        prior=DiagonalGaussianDensity((2,)), x_shape=(5,), latent_dimension=2,
        detach_before_prior=False,
    )
    variables = tail.init(rng)
    vol = volume_distortion(tail, variables, jax.random.normal(rng, (4, 2)))
    np.testing.assert_allclose(vol, 1.0, rtol=1e-5)


def _cfg(dataset, latent_dimension, model="non-square"):
    return {
        "dataset": dataset,
        "model": model,
        "non_square": model == "non-square",
        "latent_dimension": latent_dimension,
        "num_test_elbo_samples": 1,
        "vis_log_prob_min": -3,
        "vis_log_prob_max": 1,
    }


def test_2d_nonsquare_visualizer_1d_latent(writer, rng, tmp_path):
    head, variables = build_nonsquare(D=2, d=1, key=rng)
    data = np.asarray(jax.random.normal(rng, (500, 2)))
    viz = get_visualizer(_cfg("von-mises-circle", 1), writer, data)
    viz.visualize(head, variables, epoch=1, write_folder=str(tmp_path))
    assert os.path.exists(tmp_path / "density.pdf")


def test_2d_nonsquare_visualizer_2d_latent(writer, rng, tmp_path):
    head, variables = build_nonsquare(D=2, d=2, key=rng)
    data = np.asarray(jax.random.normal(rng, (500, 2)))
    viz = get_visualizer(_cfg("fuzzy-line", 2), writer, data)
    viz.visualize(head, variables, epoch=1, write_folder=str(tmp_path))
    assert os.path.exists(tmp_path / "density.pdf")


@pytest.mark.parametrize("d", [1, 2, 3])
def test_3d_nonsquare_visualizer(writer, rng, tmp_path, d):
    """Per-latent-dim parity with the reference 3-D family
    (visualizer.py:1795-2020): one random-draw panel + one fixed_sample sweep
    panel PER latent axis, each a density-colored 3-D scatter with non-empty
    collections."""
    import matplotlib.pyplot as plt

    head, variables = build_nonsquare(D=3, d=d, key=rng)
    data = np.asarray(jax.random.normal(rng, (500, 3)))
    viz = get_visualizer(_cfg("sphere", d), writer, data)

    captured = {}
    orig_savefig = plt.Figure.savefig

    def capture(fig, *a, **kw):
        captured["axes"] = fig.get_axes()
        return orig_savefig(fig, *a, **kw)

    plt.Figure.savefig = capture
    try:
        viz.visualize(head, variables, epoch=1, write_folder=str(tmp_path))
    finally:
        plt.Figure.savefig = orig_savefig
    assert os.path.exists(tmp_path / "density.pdf")
    axes3d = [a for a in captured["axes"] if a.name == "3d"]
    assert len(axes3d) == d + 1  # random panel + one sweep per latent axis
    for ax in axes3d:
        # training cloud + density-colored embedded manifold
        assert len(ax.collections) >= 2


def test_highdim_visualizer_with_invariants(writer, rng, tmp_path):
    head, variables = build_nonsquare(D=6, d=3, key=rng)
    data = np.asarray(jax.random.normal(rng, (300, 6)))
    viz = get_visualizer(_cfg("s2inr6", 6), writer, data)
    viz.visualize(head, variables, epoch=2, write_folder=str(tmp_path))
    assert os.path.exists(tmp_path / "projections.pdf")
    import json, glob

    inv_files = glob.glob(str(tmp_path / "invariants_epoch*.json"))
    assert inv_files
    inv = json.load(open(inv_files[0]))
    assert "volume_distortion_mean" in inv and "macs" in inv


def test_2d_square_visualizer(writer, rng, tmp_path):
    from cmf_tpu.densities import BijectionDensity, DiagonalGaussianDensity
    from cmf_tpu.bijections import AffineBijection

    density = BijectionDensity(
        bijection=AffineBijection((2,), per_channel=False),
        prior=DiagonalGaussianDensity((2,), num_fixed_samples=4),
    )
    variables = density.init(rng)
    data = np.asarray(jax.random.normal(rng, (500, 2)))
    viz = get_visualizer(_cfg("8gaussians", None, model="realnvp"), writer, data)
    viz.visualize(density, variables, epoch=1, write_folder=str(tmp_path))
    assert os.path.exists(tmp_path / "density.pdf")


def test_cumulative_dim_fid(rng):
    """Per-dimension FID curve: full-dim decode should beat 1-dim decode when
    the data spans multiple latent axes."""
    from cmf_tpu.viz.metric_analysis import cumulative_dim_fid

    head, variables = build_nonsquare(D=4, d=2, key=rng)
    x_ref = np.asarray(head.sample(variables, jax.random.fold_in(rng, 1), 512))
    curve = cumulative_dim_fid(
        head, variables, x_ref, jax.random.fold_in(rng, 2),
        dims_order=[0, 1], num_samples=256, batch_size=128,
    )
    assert len(curve) == 2
    assert all(np.isfinite(curve))
    assert curve[1] <= curve[0] + 1e-6  # more dims ⇒ no worse fit


def test_rips_betti_circle_and_clusters():
    from cmf_tpu.viz.metric_analysis import rips_betti

    theta = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    circle = np.stack([np.cos(theta), np.sin(theta)], 1)
    b0, b1 = rips_betti(circle)
    assert b0 == 1 and b1 >= 1  # one component, one loop

    two = np.concatenate([circle * 0.1, circle * 0.1 + 10.0])
    b0, _ = rips_betti(two)
    assert b0 == 2


class _StubImageDensity:
    """fixed_sample renders the latent as a deterministic 1x8x8 image."""

    def fixed_sample(self, variables, noise=None):
        n, d = noise.shape
        base = jnp.linspace(0, 255, 64).reshape(1, 1, 8, 8)
        coef = jnp.sum(noise, axis=1).reshape(n, 1, 1, 1)
        return np.asarray(base + coef)


def test_prominent_z_grid_batteries(rng):
    from cmf_tpu.viz.metric_analysis import (
        prominent_z_combined,
        prominent_z_cumulative,
        prominent_z_hierarchical,
        _image_grid,
    )

    density = _StubImageDensity()
    order = np.arange(10)[::-1]
    for fn, expect_rows in (
        (prominent_z_cumulative, None),
        (prominent_z_combined, None),
        (prominent_z_hierarchical, None),
    ):
        imgs, nrow = fn(density, None, order, rng)
        assert imgs.ndim == 4 and imgs.shape[1:] == (1, 8, 8)
        assert imgs.shape[0] % 1 == 0 and nrow > 1
        grid = _image_grid(imgs, nrow)
        assert grid.ndim == 3 and np.isfinite(grid).all()
    # combined: 5 subgroups => 15 (start,end) ranges, each bs+1 rows with the
    # indicator tile appended (visualizer.py:872-965)
    imgs, nrow = prominent_z_combined(density, None, order, rng)
    assert nrow == 11 and imgs.shape[0] == 15 * 11


def test_per_z_invariants_battery(rng):
    from cmf_tpu.viz.metric_analysis import per_z_invariants

    head, variables = build_nonsquare(D=4, d=2, key=rng)
    z_rows = [np.asarray(jax.random.normal(rng, (24, 2)))]
    battery = per_z_invariants(head, variables, z_rows, labels=["z_all"])
    rec = battery[0]
    assert rec["label"] == "z_all"
    for k in ("winding", "degree", "volume_distortion", "metric_rank",
              "curvature", "rips_b0", "rips_b1"):
        assert np.isfinite(rec[k]), k
    assert rec["metric_rank"] == pytest.approx(2.0)


def test_centering_visualizer_routing(writer):
    """test_center selects ImageCenteringDensityVisualizer
    (reference experiment.py:415-421)."""
    from cmf_tpu.viz.metric_analysis import (
        ImageCenteringDensityVisualizer,
        ImageMetricDensityVisualizer,
    )

    data = np.zeros((16, 1, 4, 4), np.float32)
    cfg = {**_cfg("mnist", 2), "test_center": True}
    assert isinstance(get_visualizer(cfg, writer, data), ImageCenteringDensityVisualizer)
    cfg = {**_cfg("mnist", 2), "test_metric": True}
    assert isinstance(get_visualizer(cfg, writer, data), ImageMetricDensityVisualizer)
