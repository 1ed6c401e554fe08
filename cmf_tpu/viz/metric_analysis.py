"""Metric-tensor analysis battery.

Contract: reference visualizer.py:169-1339 (ImageMetricDensityVisualizer) and
visualizer.py:2023-2318 (SixDimensionalNonSquareVisualizer): canonical-metric
diagnostics of a trained non-square flow —
* g = JᵀJ at extracted latents, diagonal g_kk sort (visualizer.py:381-397);
* latent-variance sort + cumulative variance dumps (visualizer.py:399-538);
* MACS: mean absolute cosine similarity between decoder Jacobian columns
  (the README's headline CMF metric, README.md:213-233);
* prominent-z sample sweeps (individual / cumulative).

All Jacobian work reuses the same ``jax.linearize`` machinery as training —
no autograd-vs-replay mismatch (unlike the reference, which recomputes g via
``autograd.functional.jacobian`` of fixed_sample, visualizer.py:381-397).
"""

import numpy as np
import jax
import jax.numpy as jnp

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def decoder_jacobian(density, variables, z):
    """(B, D, d) decoder Jacobian at latents z via vmapped linearization."""
    batch, d = z.shape

    def decode_flat(u):
        return density.decode(variables, u, train=False).reshape(u.shape[0], -1)

    _, lin = jax.linearize(decode_flat, z)
    basis = jnp.eye(d, dtype=z.dtype)
    cols = jax.vmap(lambda e: lin(jnp.broadcast_to(e, (batch, d))))(basis)  # (d,B,D)
    return jnp.moveaxis(cols, 0, 2)  # (B, D, d)


def metric_tensor(density, variables, z):
    """g = JᵀJ (B, d, d)."""
    J = decoder_jacobian(density, variables, z)
    return jnp.einsum("bDi,bDj->bij", J, J, precision=jax.lax.Precision.HIGHEST)


def g_kk_sort(density, variables, z):
    """Diagonal metric magnitudes, sorted descending with indices
    (visualizer.py:381-397)."""
    g = metric_tensor(density, variables, z)
    g_kk = jnp.mean(jnp.diagonal(g, axis1=-2, axis2=-1), axis=0)
    order = jnp.argsort(-g_kk)
    return np.asarray(g_kk[order]), np.asarray(order)


def latent_variance_sort(density, variables, x):
    """Latent coordinate variances, sorted + cumulative fractions
    (visualizer.py:399-538)."""
    z = density.extract_latent(variables, x)
    var = jnp.var(z, axis=0)
    order = jnp.argsort(-var)
    var_sorted = var[order]
    cumfrac = jnp.cumsum(var_sorted) / jnp.sum(var_sorted)
    return np.asarray(var_sorted), np.asarray(order), np.asarray(cumfrac)


def macs(density, variables, z):
    """Mean absolute cosine similarity between decoder Jacobian columns —
    the canonical-flow orthogonality score (README.md:224-233: lower is more
    canonical; CMF reports ~0.02-0.03)."""
    J = decoder_jacobian(density, variables, z)  # (B, D, d)
    norms = jnp.linalg.norm(J, axis=1, keepdims=True)  # (B, 1, d)
    Jn = J / (norms + 1e-12)
    cos = jnp.einsum("bDi,bDj->bij", Jn, Jn)
    d = cos.shape[-1]
    off = jnp.abs(cos) * (1 - jnp.eye(d))
    per_example = jnp.sum(off, axis=(1, 2)) / (d * (d - 1))
    return float(jnp.mean(per_example)), np.asarray(jnp.mean(jnp.abs(cos), axis=0))


class ImageMetricDensityVisualizer:
    """Post-hoc metric analysis for image models (visualizer.py:169-1339):
    g_kk sort, latent variance sort, MACS matrix, prominent-z sweeps."""

    def __init__(self, writer, x_train, num_elbo_samples=1, max_points=256):
        self._writer = writer
        self._x = np.asarray(x_train)[:max_points]
        self._num_elbo_samples = num_elbo_samples

    def visualize(self, density, variables, epoch, write_folder=None):
        x = jnp.asarray(self._x)
        z = density.extract_latent(variables, x)

        g_sorted, g_order = g_kk_sort(density, variables, z)
        var_sorted, var_order, cumfrac = latent_variance_sort(density, variables, x)
        macs_value, cos_matrix = macs(density, variables, z)

        self._writer.write_json(
            f"metric_analysis_epoch{epoch}",
            {
                "g_kk_sorted": g_sorted.tolist(),
                "g_kk_order": g_order.tolist(),
                "latent_variance_sorted": var_sorted.tolist(),
                "latent_variance_order": var_order.tolist(),
                "cumulative_variance": cumfrac.tolist(),
                "macs": macs_value,
            },
        )
        self._writer.write_scalar("metric/macs", macs_value, global_step=epoch)

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        axes[0].bar(range(len(g_sorted)), g_sorted)
        axes[0].set_title("sorted g_kk")
        axes[1].plot(cumfrac, marker="o")
        axes[1].set_title("cumulative latent variance")
        im = axes[2].imshow(cos_matrix, vmin=0, vmax=1, cmap="magma")
        axes[2].set_title(f"|cos| (MACS={macs_value:.3f})")
        fig.colorbar(im, ax=axes[2])
        self._writer.write_figure(f"metric_analysis_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/metric_analysis.pdf")
        plt.close(fig)

        self._prominent_z_samples(density, variables, z, var_order, epoch, write_folder)

    def _prominent_z_samples(self, density, variables, z, order, epoch, write_folder):
        """Sample sweeps along the most prominent latent axes
        (visualizer.py:539-1339, individual + cumulative grids)."""
        mean_z = jnp.mean(z, axis=0)
        std_z = jnp.std(z, axis=0)
        num_axes = min(4, z.shape[1])
        sweep = jnp.linspace(-2.0, 2.0, 7)
        rows = []
        for k in range(num_axes):
            axis = int(order[k])
            zs = jnp.tile(mean_z, (7, 1))
            zs = zs.at[:, axis].set(mean_z[axis] + sweep * std_z[axis])
            rows.append(np.asarray(density.decode(variables, zs, train=False)))
        rows = np.stack(rows)  # (num_axes, 7, *x_shape)

        if rows.ndim >= 4:  # images
            fig, axes = plt.subplots(num_axes, 7, figsize=(14, 2 * num_axes))
            for i in range(num_axes):
                for j in range(7):
                    ax = axes[i, j] if num_axes > 1 else axes[j]
                    img = np.clip(rows[i, j], 0, 256) / 256.0
                    ax.imshow(np.moveaxis(img, 0, 2).squeeze(), cmap="gray")
                    ax.axis("off")
            self._writer.write_figure(f"prominent_z_epoch{epoch}", fig, global_step=epoch)
            if write_folder is not None:
                fig.savefig(f"{write_folder}/prominent_z.pdf")
            plt.close(fig)


def cumulative_dim_fid(density, variables, x_ref, rng, dims_order, feature_fn=None,
                       num_samples=512, batch_size=128):
    """FID of samples decoded with only the top-k latent axes active
    (k = 1..d, cumulative), vs reference data — the per-dimension FID battery
    of the reference visualizer (visualizer.py:169-1339).

    Latent axes outside the active set are frozen at the latent mean; the
    resulting curve shows how many canonical dimensions carry the data.
    """
    from ..eval.fid import activation_statistics, frechet_distance

    ref_mu, ref_cov = activation_statistics(
        iter([jnp.asarray(x_ref[i : i + batch_size]) for i in range(0, len(x_ref), batch_size)]),
        feature_fn,
    )
    z_data = density.extract_latent(variables, jnp.asarray(x_ref[: min(len(x_ref), 1024)]))
    mean_z = jnp.mean(z_data, axis=0)

    d = z_data.shape[1]
    curve = []
    for k in range(1, d + 1):
        active = jnp.zeros(d).at[jnp.asarray(dims_order[:k])].set(1.0)

        def batches():
            # Latents from a Gaussian fit of the data latent distribution,
            # restricted to the active axes.
            n = 0
            key = rng
            std_z = jnp.std(z_data, axis=0)
            while n < num_samples:
                key, sub = jax.random.split(key)
                z = mean_z + std_z * jax.random.normal(sub, (batch_size, d))
                z = mean_z + (z - mean_z) * active
                yield density.decode(variables, z, train=False)
                n += batch_size

        mu, cov = activation_statistics(batches(), feature_fn)
        curve.append(frechet_distance(ref_mu, ref_cov, mu, cov))
    return curve


class ImageCenteringDensityVisualizer:
    """Centering analysis (visualizer.py:1341-1375): reconstructions of
    original vs mean-centered inputs through the injective chain — a visual
    check of where the learned manifold sits relative to the data mean."""

    def __init__(self, writer, x_train, num_elbo_samples=1, max_points=8):
        self._writer = writer
        self._x = np.asarray(x_train)[:max_points]

    def visualize(self, density, variables, epoch, write_folder=None):
        x = jnp.asarray(self._x)
        z = density.extract_latent(variables, x)
        recon = np.asarray(density.decode(variables, z, train=False))
        mean = jnp.mean(x, axis=0, keepdims=True)
        z_c = density.extract_latent(variables, x - mean + jnp.mean(mean))
        recon_c = np.asarray(density.decode(variables, z_c, train=False))

        n = self._x.shape[0]
        fig, axes = plt.subplots(3, n, figsize=(2 * n, 6))
        for i in range(n):
            for row, img in enumerate((self._x[i], recon[i], recon_c[i])):
                ax = axes[row, i]
                ax.imshow(np.clip(np.moveaxis(img, 0, 2).squeeze(), 0, 256) / 256.0, cmap="gray")
                ax.axis("off")
        axes[0, 0].set_title("input", loc="left")
        axes[1, 0].set_title("reconstruction", loc="left")
        axes[2, 0].set_title("centered recon", loc="left")
        self._writer.write_figure(f"centering_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/centering.pdf")
        plt.close(fig)


def volume_distortion(density, variables, z):
    """√det(JᵀJ) per example — the local volume element of the decoder
    (visualizer.py:2023-2318 volume-distortion invariant)."""
    g = metric_tensor(density, variables, z)
    sign, logdet = jnp.linalg.slogdet(g)
    return np.asarray(jnp.exp(0.5 * logdet))


def winding_number(curve_xy):
    """Winding of a closed planar curve around the origin (the circle-family
    topological invariant, visualizer.py SixDimensional battery)."""
    theta = np.unwrap(np.arctan2(curve_xy[:, 1], curve_xy[:, 0]))
    return float((theta[-1] - theta[0]) / (2 * np.pi))


def discrete_curvature(curve):
    """Mean discrete curvature of a polyline sweep (turning angle per unit
    length) — curvature invariant analogue."""
    d1 = np.diff(curve, axis=0)
    seg = np.linalg.norm(d1, axis=1) + 1e-12
    t = d1 / seg[:, None]
    cos_angles = np.clip(np.sum(t[1:] * t[:-1], axis=1), -1, 1)
    angles = np.arccos(cos_angles)
    return float(np.sum(angles) / np.sum(seg))


class HighDimensionalNonSquareVisualizer:
    """4-D/6-D ambient diagnostics (visualizer.py:2023-2318): coordinate-pair
    projections of data vs samples, per-latent-axis manifold sweeps, mean-|J|
    heatmap, MACS matrix, and geometric invariants (volume distortion,
    winding, discrete curvature)."""

    def __init__(self, writer, x_train, num_elbo_samples=1, max_points=1000):
        self._writer = writer
        self._x = np.asarray(x_train)[:max_points]
        self._num_elbo_samples = num_elbo_samples

    def visualize(self, density, variables, epoch, write_folder=None):
        x = jnp.asarray(self._x)
        z = density.extract_latent(variables, x)
        samples = np.asarray(
            density.sample(variables, jax.random.PRNGKey(epoch), self._x.shape[0])
        )

        D = self._x.shape[1]
        pairs = [(i, i + 1) for i in range(0, D - 1, 2)][:3]
        fig, axes = plt.subplots(1, len(pairs), figsize=(5 * len(pairs), 4))
        if len(pairs) == 1:
            axes = [axes]
        for ax, (i, j) in zip(axes, pairs):
            ax.scatter(self._x[:, i], self._x[:, j], s=2, alpha=0.4, label="data")
            ax.scatter(samples[:, i], samples[:, j], s=2, alpha=0.4, label="model")
            ax.set_title(f"dims ({i},{j})")
            ax.legend()
        self._writer.write_figure(f"projections_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/projections.pdf")
        plt.close(fig)

        J = decoder_jacobian(density, variables, z[:256])
        mean_absJ = np.asarray(jnp.mean(jnp.abs(J), axis=0))
        macs_value, cos_matrix = macs(density, variables, z[:256])
        self._writer.write_scalar("metric/macs", macs_value, global_step=epoch)

        # Geometric invariants + per-axis sweeps
        vol = volume_distortion(density, variables, z[:256])
        mean_z = jnp.mean(z, axis=0)
        std_z = jnp.std(z, axis=0)
        invariants = {"volume_distortion_mean": float(np.mean(vol)),
                      "volume_distortion_std": float(np.std(vol)),
                      "macs": macs_value}
        sweeps = {}
        for k in range(min(3, z.shape[1])):
            t = jnp.linspace(-2.0, 2.0, 64)
            zs = jnp.tile(mean_z, (64, 1)).at[:, k].set(mean_z[k] + t * std_z[k])
            curve = np.asarray(density.decode(variables, zs, train=False))
            sweeps[k] = curve
            invariants[f"axis{k}_winding_xy"] = winding_number(curve[:, :2])
            invariants[f"axis{k}_curvature"] = discrete_curvature(curve)
        self._writer.write_json(f"invariants_epoch{epoch}", invariants)

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        im0 = axes[0].imshow(mean_absJ, aspect="auto", cmap="viridis")
        axes[0].set_title("mean |J|")
        fig.colorbar(im0, ax=axes[0])
        im1 = axes[1].imshow(cos_matrix, vmin=0, vmax=1, cmap="magma")
        axes[1].set_title(f"|cos| (MACS={macs_value:.3f})")
        fig.colorbar(im1, ax=axes[1])
        self._writer.write_figure(f"jacobian_epoch{epoch}", fig, global_step=epoch)
        if write_folder is not None:
            fig.savefig(f"{write_folder}/jacobian.pdf")
        plt.close(fig)
