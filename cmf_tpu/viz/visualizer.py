"""Visualizers — density/manifold diagnostic plots at test epochs.

Contract: reference cmf/visualizer.py (14 classes, selection logic at
experiment.py:403-501). This module carries the core set; the metric-analysis
battery (ImageMetricDensityVisualizer internals) lives in viz/metric_analysis.

All visualizers are pure observers: ``visualize(density, variables, epoch,
write_folder=None)`` renders figures to the writer (and optionally a folder).
Matplotlib uses the Agg backend — no display server on TPU hosts.
"""

import numpy as np
import jax
import jax.numpy as jnp

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


class DummyDensityVisualizer:
    def __init__(self, writer=None):
        self._writer = writer

    def visualize(self, density, variables, epoch, write_folder=None):
        return


class ImageDensityVisualizer:
    """Sample grids at test epochs (visualizer.py:49-74)."""

    def __init__(self, writer, num_fixed_samples=64):
        self._writer = writer

    def visualize(self, density, variables, epoch, write_folder=None):
        imgs = np.asarray(density.fixed_sample(variables))
        imgs = np.clip(imgs, 0.0, 256.0) / 256.0
        n = int(np.floor(np.sqrt(imgs.shape[0])))
        imgs = imgs[: n * n]
        c, h, w = imgs.shape[1:]
        grid = imgs.reshape(n, n, c, h, w).transpose(2, 0, 3, 1, 4).reshape(c, n * h, n * w)
        self._writer.write_image("samples", grid, global_step=epoch)
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(np.moveaxis(grid, 0, 2).squeeze(), cmap="gray" if c == 1 else None)
        ax.axis("off")
        self._writer.write_figure(f"samples_epoch{epoch}", fig, global_step=epoch)
        plt.close(fig)


class TwoDimensionalDensityVisualizer:
    """Contour of exp(log p) on a grid over the data range
    (visualizer.py:1418-1461)."""

    _GRID_SIZE = 100
    _NUM_TRAIN_POINTS = 500

    def __init__(self, writer, train_data, num_elbo_samples=10):
        self._writer = writer
        self._x = np.asarray(train_data)
        self._num_elbo_samples = num_elbo_samples

    def visualize(self, density, variables, epoch, write_folder=None):
        from ..eval.metrics import metrics

        x1 = np.linspace(self._x[:, 0].min(), self._x[:, 0].max(), self._GRID_SIZE)
        x2 = np.linspace(self._x[:, 1].min(), self._x[:, 1].max(), self._GRID_SIZE)
        g1, g2 = np.meshgrid(x1, x2)
        grid = jnp.asarray(np.stack([g1.reshape(-1), g2.reshape(-1)], 1), jnp.float32)
        out = metrics(density, variables, grid, self._num_elbo_samples,
                      rng=jax.random.PRNGKey(epoch))
        probs = np.exp(np.asarray(out["log-prob"])).reshape(self._GRID_SIZE, self._GRID_SIZE)

        fig, ax = plt.subplots(figsize=(6, 6))
        cs = ax.contourf(g1, g2, probs, levels=50)
        ax.scatter(self._x[: self._NUM_TRAIN_POINTS, 0], self._x[: self._NUM_TRAIN_POINTS, 1],
                   s=2, c="white", alpha=0.5)
        fig.colorbar(cs)
        self._writer.write_figure(f"density_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/density.pdf")
        plt.close(fig)


class TwoDimensionalNonSquareVisualizer:
    """1-D-latent manifold visualization (visualizer.py:1464-1615): learned
    manifold colored by density, decoder speed |g'(z)| plot, pullback density
    along the latent with the von-Mises ground truth overlay for the circle
    dataset (visualizer.py:1558-1583), and a latent histogram/KDE.

    The 2-D-latent variant (TwoDimensionalNonSquareVisualizer_2dlatent,
    visualizer.py:1669+) renders the density contour + model samples instead.
    """

    _NUM_SWEEP = 1000

    def __init__(self, writer, train_data, log_prob_low, log_prob_high, dataset=None):
        self._writer = writer
        self._x = np.asarray(train_data)
        self._bounds = (log_prob_low, log_prob_high)
        self._dataset = dataset

    def visualize(self, density, variables, epoch, write_folder=None):
        lat = np.asarray(density.extract_latent(variables, jnp.asarray(self._x[:2000])))
        if lat.shape[1] == 1:
            self._visualize_1d(density, variables, lat, epoch, write_folder)
        else:
            self._visualize_2d(density, variables, epoch, write_folder)

    def _visualize_1d(self, density, variables, lat, epoch, write_folder):
        lo, hi = np.percentile(lat[:, 0], [0.5, 99.5])
        sweep = jnp.asarray(np.linspace(lo, hi, self._NUM_SWEEP, dtype=np.float32))[:, None]
        curve = np.asarray(density.decode(variables, sweep))

        info, _ = density.elbo(variables, jnp.asarray(curve), train=False)
        log_probs = np.asarray(info["elbo"])

        # Decoder speed |dg/dz| along the sweep (visualizer.py speed plot)
        def decode_one(z):
            return density.decode(variables, z[None], train=False)[0]

        tangents = np.asarray(
            jax.vmap(lambda z: jax.jvp(decode_one, (z,), (jnp.ones_like(z),))[1])(sweep)
        )
        speed = np.linalg.norm(tangents.reshape(self._NUM_SWEEP, -1), axis=1)

        fig, axes = plt.subplots(2, 2, figsize=(12, 9))
        axes[0, 0].scatter(self._x[:1000, 0], self._x[:1000, 1], s=2, c="grey", alpha=0.4)
        sc = axes[0, 0].scatter(
            curve[:, 0], curve[:, 1], s=4,
            c=np.clip(log_probs, *self._bounds) if self._bounds[0] is not None else log_probs,
            cmap="viridis",
        )
        fig.colorbar(sc, ax=axes[0, 0])
        axes[0, 0].set_title("manifold, colored by log-density")

        axes[0, 1].plot(np.asarray(sweep[:, 0]), speed)
        axes[0, 1].set_title("decoder speed |g'(z)|")

        # Pullback density along the embedded curve, with the von-Mises
        # closed form for the circle dataset (visualizer.py:1575-1583)
        try:
            pullback = np.asarray(
                density.pullback_log_jac_jac_transpose(variables, jnp.asarray(curve))
            )
            axes[1, 0].plot(np.asarray(sweep[:, 0]), log_probs + pullback / 2.0,
                            label="model pullback")
            if self._dataset == "von-mises-circle":
                theta = np.arctan2(curve[:, 1], curve[:, 0])
                from scipy.stats import vonmises

                axes[1, 0].plot(
                    np.asarray(sweep[:, 0]),
                    np.log(vonmises.pdf(theta, 1.0, loc=np.pi / 2) + 1e-12),
                    "--", label="von-Mises ground truth",
                )
            axes[1, 0].legend()
            axes[1, 0].set_title("pullback log-density")
        except Exception:
            pass

        axes[1, 1].hist(lat[:, 0], bins=50, density=True)
        axes[1, 1].set_title("latent histogram")

        self._writer.write_figure(f"manifold_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/density.pdf")
        plt.close(fig)

    def _visualize_2d(self, density, variables, epoch, write_folder):
        from ..eval.metrics import metrics

        g = 80
        x1 = np.linspace(self._x[:, 0].min() - 0.5, self._x[:, 0].max() + 0.5, g)
        x2 = np.linspace(self._x[:, 1].min() - 0.5, self._x[:, 1].max() + 0.5, g)
        g1, g2 = np.meshgrid(x1, x2)
        grid = jnp.asarray(np.stack([g1.reshape(-1), g2.reshape(-1)], 1), jnp.float32)
        out = metrics(density, variables, grid, 1, rng=jax.random.PRNGKey(epoch))
        probs = np.exp(np.asarray(out["log-prob"])).reshape(g, g)
        samples = np.asarray(density.sample(variables, jax.random.PRNGKey(epoch), 1000))

        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        cs = axes[0].contourf(g1, g2, probs, levels=40)
        fig.colorbar(cs, ax=axes[0])
        axes[0].set_title("model density")
        axes[1].scatter(self._x[:1000, 0], self._x[:1000, 1], s=2, alpha=0.4, label="data")
        axes[1].scatter(samples[:, 0], samples[:, 1], s=2, alpha=0.4, label="model")
        axes[1].legend()
        self._writer.write_figure(f"density_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/density.pdf")
        plt.close(fig)


class ThreeDimensionalNonSquareVisualizer:
    """3-D ambient manifolds with 1/2/3-D latents — the reference's
    ``ThreeDimensionalNonSquareVisualizer_{1,2,3}dlatent`` family
    (visualizer.py:1795-2020, base 1619-1663), one class dispatching on the
    latent dimension:

    * panel (i): the embedded manifold under a full random latent draw
      (500 standard-normal latents through ``fixed_sample``);
    * panels (ii)..: one per latent axis — ``fixed_sample`` sweeps
      linspace(−2.5, 2.5, 100) along axis k with the other axes held at 0
      (the reference's ``numbers`` lists);
    * every panel: density-colored scatter of the decoded points (elbo with
      reconstruction off, min–max scaled to [−1, 1] for the 3-latent layout
      exactly as visualizer.py:1855-1859) over the training cloud.

    Layouts follow the reference: 1-latent → 2 stacked panels, 2-latent → 3
    stacked panels, 3-latent → 4 panels in a row with (i)-(iv) labels.
    """

    _NUM_TRAIN_POINTS_TO_SHOW = 500
    _NUM_SAMPLE_POINTS_TO_SHOW = 500
    _NUM_SWEEP = 100
    _SWEEP_LO, _SWEEP_HI = -2.5, 2.5
    _CMAP = "plasma"
    _FS = 15

    def __init__(self, writer, train_data, latent_dimension=None):
        self._writer = writer
        self._x = np.asarray(train_data)
        self._latent_dimension = latent_dimension

    def _latent_panels(self, L, rng):
        """[(label, latent noise (N, L))] — random draw then per-axis sweeps."""
        sweep = np.linspace(self._SWEEP_LO, self._SWEEP_HI, self._NUM_SWEEP, dtype=np.float32)
        panels = [np.asarray(
            jax.random.normal(rng, (self._NUM_SAMPLE_POINTS_TO_SHOW, L)), np.float32
        )]
        for k in range(L):
            noise = np.zeros((self._NUM_SWEEP, L), np.float32)
            noise[:, k] = sweep
            panels.append(noise)
        labels = ["(i)", "(ii)", "(iii)", "(iv)"][: L + 1]
        return list(zip(labels, panels))

    def visualize(self, density, variables, epoch, write_folder=None):
        L = self._latent_dimension
        if L is None:
            L = int(np.asarray(density.extract_latent(variables, jnp.asarray(self._x[:2]))).shape[1])
        panels = self._latent_panels(L, jax.random.PRNGKey(epoch))

        x = self._x[
            np.random.default_rng(epoch).integers(
                0, self._x.shape[0], self._NUM_TRAIN_POINTS_TO_SHOW
            )
        ]
        row_layout = L == 3  # 3-latent: 4 panels in a row (visualizer.py:1838)
        if row_layout:
            fig = plt.figure(figsize=(16, 4.5))
        else:
            fig = plt.figure(figsize=(6, 5 * len(panels)))

        im = None
        for i, (label, noise) in enumerate(panels):
            if row_layout:
                ax = fig.add_subplot(1, len(panels), i + 1, projection="3d")
            else:
                ax = fig.add_subplot(len(panels), 1, i + 1, projection="3d")
            ax.grid(False)
            ax.set_axis_off()
            embedded = density.fixed_sample(variables, noise=jnp.asarray(noise))
            info, _ = density.elbo(variables, embedded, train=False,
                                   add_reconstruction=False, likelihood_wt=1.0)
            embedded = np.asarray(embedded)
            log_probs = np.asarray(info["elbo"]).reshape(-1)
            if row_layout:
                # min-max scale to [-1, 1] (visualizer.py:1855-1859)
                lo, hi = log_probs.min(), log_probs.max()
                log_probs = 2.0 * (log_probs - lo) / max(hi - lo, 1e-12) - 1.0
            ax.text2D(0.05, 0.9, label, fontsize=self._FS, transform=ax.transAxes)
            ax.scatter(x[:, 0], x[:, 1], x[:, 2], c="k", marker=".", s=7,
                       linewidth=0.5, alpha=0.3)
            im = ax.scatter(
                embedded[:, 0], embedded[:, 1], embedded[:, 2],
                c=log_probs, cmap=self._CMAP, marker="o",
                s=40 if row_layout else 7,
            )
            if not row_layout:
                cb = fig.colorbar(im, ax=ax, extend="both", shrink=0.8)
                cb.set_label(r"$\log p(x)$", fontsize=self._FS)
        if row_layout and im is not None:
            cax = fig.add_axes([0.92, 0.15, 0.015, 0.7])
            cb = fig.colorbar(im, cax=cax)
            cb.set_label(r"$\log p(x)$", fontsize=self._FS)

        self._writer.write_figure(f"manifold3d_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/density.pdf", bbox_inches="tight")
        plt.close(fig)
