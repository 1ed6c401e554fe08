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

import os

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


def canonical_metric_summary(density, variables, x, max_points=256,
                             var_threshold=0.95):
    """Scalar canonical-metric diagnostics for the CMF-vs-RNF A/B comparison
    (README.md:213-235: CMF's claim is that the g_ij regularizer drives the
    decoder metric toward canonical form — lower MACS, more diagonal JᵀJ,
    variance concentrated in fewer latent axes).

    Returns a flat dict:
      * ``macs`` — mean absolute cosine similarity of Jacobian columns;
      * ``g_diag_dominance`` — mean_i |g_ii| / Σ_j |g_ij| (1.0 = diagonal);
      * ``g_offdiag_ratio`` — Σ off-diag |g_ij| / Σ diag |g_ii| (0 = diagonal);
      * ``effective_dim_variance`` — latent axes needed for ``var_threshold``
        of cumulative latent variance (visualizer.py:399-538 dumps);
      * ``effective_dim_gkk`` — same threshold applied to sorted g_kk mass.
    """
    x = jnp.asarray(x)[:max_points]
    z = density.extract_latent(variables, x)
    # ONE decoder linearization serves both MACS and g = JᵀJ (the d-column
    # fan-out is the expensive part — a full conv decode per column).
    J = decoder_jacobian(density, variables, z)  # (B, D, d)
    norms = jnp.linalg.norm(J, axis=1, keepdims=True)
    Jn = J / (norms + 1e-12)
    cos = jnp.einsum("bDi,bDj->bij", Jn, Jn)
    d_lat = cos.shape[-1]
    off = jnp.abs(cos) * (1 - jnp.eye(d_lat))
    macs_value = float(jnp.mean(jnp.sum(off, axis=(1, 2)) / (d_lat * (d_lat - 1))))

    g = jnp.einsum("bDi,bDj->bij", J, J, precision=jax.lax.Precision.HIGHEST)
    diag = jnp.abs(jnp.diagonal(g, axis1=-2, axis2=-1))  # (B, d)
    row_abs = jnp.sum(jnp.abs(g), axis=-1)  # (B, d)
    diag_dominance = float(jnp.mean(diag / (row_abs + 1e-12)))
    offdiag_ratio = float(
        jnp.mean(jnp.sum(row_abs - diag, axis=-1) / (jnp.sum(diag, axis=-1) + 1e-12))
    )

    def _effective_dim(mass):
        mass = np.asarray(mass, dtype=np.float64)
        mass = np.sort(mass)[::-1]
        cum = np.cumsum(mass) / max(mass.sum(), 1e-30)
        return int(np.searchsorted(cum, var_threshold) + 1)

    _, _, cumfrac = latent_variance_sort(density, variables, x)
    g_kk = np.asarray(jnp.mean(diag, axis=0))
    return {
        "macs": macs_value,
        "g_diag_dominance": diag_dominance,
        "g_offdiag_ratio": offdiag_ratio,
        "effective_dim_variance": int(np.searchsorted(np.asarray(cumfrac), var_threshold) + 1),
        "effective_dim_gkk": _effective_dim(g_kk),
    }


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
        self._prominent_z_grids(density, variables, var_order, epoch, write_folder)
        if write_folder is not None:
            # test_metric/{recon,fid}.json effective-z curves
            # (visualizer.py:688-718) — inputs to the effective-z CLIs.
            import json

            recon_dict, fid_dict = effective_z_curves(
                density, variables, jnp.asarray(self._x), var_order
            )
            savedir = os.path.join(write_folder, "test_metric")
            os.makedirs(savedir, exist_ok=True)
            with open(os.path.join(savedir, "recon.json"), "w") as f:
                json.dump(recon_dict, f, indent=4)
            with open(os.path.join(savedir, "fid.json"), "w") as f:
                json.dump(fid_dict, f, indent=4)

    def _prominent_z_grids(self, density, variables, order, epoch, write_folder):
        """Cumulative / combined / hierarchical prominent-z batteries
        (visualizer.py:810-1064) — image models only."""
        if np.asarray(self._x).ndim != 4:
            return
        rng = jax.random.PRNGKey(14545)
        for name, fn, tag in (
            ("samples_cumulative", prominent_z_cumulative, "prominent_z_cumulative"),
            ("samples_sequential", prominent_z_combined, "prominent_z_combined"),
            ("samples_hierarchical", prominent_z_hierarchical, "prominent_z_hierarchical"),
        ):
            imgs, nrow = fn(density, variables, order, rng)
            grid = _image_grid(imgs, nrow)
            fig, ax = plt.subplots(figsize=(12, 12 * grid.shape[0] / grid.shape[1]))
            ax.imshow(grid.squeeze() if grid.shape[2] == 1 else grid, cmap="gray")
            ax.set_aspect("auto")
            ax.axis("off")
            self._writer.write_figure(f"{tag}_epoch{epoch}", fig, global_step=epoch)
            if write_folder is not None:
                import os

                savedir = os.path.join(write_folder, "plotted_samples_prominent_d")
                os.makedirs(savedir, exist_ok=True)
                fig.savefig(os.path.join(savedir, f"{name}.pdf"))
            plt.close(fig)

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


def _image_grid(images, nrow, pad=1):
    """Stack (N, C, H, W) images into one normalized grid array (H', W', C)
    — the torchvision.make_grid role in the reference's prominent-z plots."""
    images = np.asarray(images, dtype=np.float64)
    n, c, h, w = images.shape
    lo = images.reshape(n, -1).min(axis=1)[:, None, None, None]
    hi = images.reshape(n, -1).max(axis=1)[:, None, None, None]
    images = (images - lo) / np.maximum(hi - lo, 1e-12)  # scale_each=True
    ncol = nrow
    nrows = int(np.ceil(n / ncol))
    grid = np.ones((c, nrows * (h + pad) + pad, ncol * (w + pad) + pad))
    for idx in range(n):
        r, cidx = divmod(idx, ncol)
        y, x = r * (h + pad) + pad, cidx * (w + pad) + pad
        grid[:, y : y + h, x : x + w] = images[idx]
    return np.moveaxis(grid, 0, 2)


def _subgroup_latents(order, d):
    """Latent dims split into 5 prominence subgroups, most prominent first
    (reference visualizer.py:810-1064 ``np.array_split`` convention)."""
    order = np.asarray(order)
    return [np.asarray(g) for g in np.array_split(order, min(5, d))]


def prominent_z_cumulative(density, variables, order, rng, bs=10):
    """Cumulative prominent-z grid (visualizer.py:810-871): seeded random
    latents with progressively more prominence-subgroups active (the rest
    zeroed), decoded through ``fixed_sample``; one grid row per activation
    level → samples_cumulative.pdf."""
    d = len(order)
    groups = _subgroup_latents(order, d)
    z = jax.random.normal(rng, (bs, d))
    rows, active = [], np.zeros(d, np.float32)
    for g in groups:
        active[g] = 1.0
        rows.append(np.asarray(density.fixed_sample(variables, noise=z * active)))
    return np.concatenate(rows, axis=0), bs


def prominent_z_combined(density, variables, order, rng, bs=10):
    """Combined prominent-z grid (visualizer.py:872-965): every contiguous
    subgroup range [start..end] activated in turn, each row tagged with an
    indicator tile marking the active dims → samples_sequential.pdf."""
    d = len(order)
    groups = _subgroup_latents(order, d)
    z = jax.random.normal(rng, (bs, d))
    x_probe = np.asarray(density.fixed_sample(variables, noise=z[:1]))
    c, h, w = x_probe.shape[1:]

    ncols = int(np.ceil(np.sqrt(d)))
    nrows_sq = int(np.ceil(d / ncols))
    sq = max(1, h // max(ncols, nrows_sq))

    rows = []
    for start in range(len(groups)):
        for end in range(start, len(groups)):
            active = np.zeros(d, np.float32)
            for g in groups[start : end + 1]:
                active[g] = 1.0
            imgs = np.asarray(density.fixed_sample(variables, noise=z * active))
            indicator = np.full((1, c, h, w), 255.0, np.float32)
            for pos, dim in enumerate(np.asarray(order)):
                if active[dim]:
                    ii, jj = divmod(pos, ncols)
                    indicator[0, :, ii * sq : ii * sq + sq - 1, jj * sq : jj * sq + sq - 1] = 0.0
            rows.append(np.concatenate([imgs, indicator], axis=0))
    return np.concatenate(rows, axis=0), bs + 1


def prominent_z_hierarchical(density, variables, order, rng, bs=4):
    """Hierarchical prominent-z grid (visualizer.py:966-1064): a 4-level
    binary tree over the top prominence subgroups — level k assigns subgroup
    values by the binary expansion of the column index, showing how each
    subgroup refines the samples → samples_hierarchical.pdf."""
    d = len(order)
    groups = _subgroup_latents(order, d)
    k_levels = min(4, len(groups))
    seeds = np.asarray(jax.random.normal(rng, (2 * bs, max(len(g) for g in groups))))

    x_probe = np.asarray(density.fixed_sample(variables, noise=jnp.zeros((1, d))))
    blank = np.full((1,) + x_probe.shape[1:], 255.0, np.float32)
    full_cols = bs * 2 ** (k_levels - 1)

    level_rows = []
    for level in range(1, k_levels + 1):
        n = bs * 2 ** (level - 1)
        z = np.zeros((n, d), np.float32)
        for j in range(n):
            for gi in range(level):
                idx = (j >> (level - 1 - gi)) % 2 if gi > 0 else j >> (level - 1)
                g = groups[gi]
                z[j, g] = seeds[idx, : len(g)]
        imgs = np.asarray(density.fixed_sample(variables, noise=jnp.asarray(z)))
        pad = (full_cols - n) // 2
        row = np.concatenate([np.repeat(blank, pad, 0), imgs, np.repeat(blank, full_cols - n - pad, 0)], axis=0)
        level_rows.append(row)
    return np.concatenate(level_rows, axis=0), full_cols


def rips_betti(points, max_points=256, scale=1.0):
    """Betti-0/1 of the Vietoris–Rips (flag) complex on sampled manifold
    points — the genuine persistent-homology counterpart of the reference's
    metric-rank proxy (visualizer.py:2141-2144 counts positive eigenvalues of
    g·gᵀ, i.e. local intrinsic dimension, and labels it "Betti").

    ε is ``scale`` × the median nearest-neighbour distance; b0 from
    union-find over ε-edges, b1 via the Euler characteristic of the clique
    complex truncated at 2-simplices (b1 = b0 − V + E − T, exact when the
    complex has no higher-dimensional homology).
    """
    pts = np.asarray(points)[:max_points].reshape(len(points[:max_points]), -1)
    n = len(pts)
    d2 = np.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
    nn = np.sqrt(np.partition(d2 + np.eye(n) * 1e18, 1, axis=1)[:, 1])
    eps = scale * np.median(nn) * 2.0
    adj = (np.sqrt(d2) <= eps) & ~np.eye(n, dtype=bool)

    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    edges = 0
    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                edges += 1
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    b0 = len({find(i) for i in range(n)})
    adj_f = adj.astype(np.float64)
    triangles = int(round(np.trace(adj_f @ adj_f @ adj_f) / 6.0))
    b1 = max(0, b0 - n + edges - triangles)
    return b0, b1


def per_z_invariants(density, variables, z_rows, labels=None):
    """The reference's per-latent-row topological battery
    (visualizer.py:2111-2156): winding det(JJᵀ), degree Σ sign(det g),
    volume distortion |det g|^½, metric-rank ("Betti" in the reference's
    naming), curvature tr(g) — plus the Rips b0/b1 of the decoded row."""
    out = []
    for row_idx, zs in enumerate(z_rows):
        J = decoder_jacobian(density, variables, jnp.asarray(zs))  # (B, D, d)
        g = jnp.einsum("bDi,bDj->bij", J, J, precision=jax.lax.Precision.HIGHEST)
        sign, logdet = jnp.linalg.slogdet(g)
        eig = jnp.linalg.eigvalsh(g)
        rank = jnp.sum(eig > 1e-6 * jnp.max(eig, axis=1, keepdims=True), axis=1)
        decoded = np.asarray(density.decode(variables, jnp.asarray(zs), train=False))
        b0, b1 = rips_betti(decoded)
        out.append({
            "label": labels[row_idx] if labels else f"row{row_idx}",
            "winding": float(jnp.mean(sign * jnp.exp(logdet))),
            "degree": float(jnp.sum(sign)),
            "volume_distortion": float(jnp.mean(jnp.exp(0.5 * logdet))),
            "metric_rank": float(jnp.mean(rank)),
            "curvature": float(jnp.mean(jnp.trace(g, axis1=-2, axis2=-1))),
            "rips_b0": b0,
            "rips_b1": b1,
        })
    return out


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


def effective_z_curves(density, variables, x, order, feature_fn=None, num_steps=10):
    """Reconstruction MSE and FID restricted to the top-k prominent latents
    (reference visualizer.py:600-718): encode x, zero every latent axis
    outside the k most prominent (``order``, most-prominent-first), decode,
    and score against the originals.  Returns ({k: mse}, {k: fid}) keyed by
    effective dimension — the payloads of ``test_metric/recon.json`` and
    ``test_metric/fid.json`` that the effective-z analysis CLIs aggregate.
    """
    from ..eval.fid import activation_statistics, frechet_distance

    x = jnp.asarray(x)
    z = density.extract_latent(variables, x)
    d = z.shape[1]
    mult = max(1, d // num_steps)
    dims = sorted({min(max(k * mult, 1), d) for k in range(num_steps + 1)})
    ref_mu, ref_cov = activation_statistics(iter([x]), feature_fn)
    order = np.asarray(order)
    recons, fids = {}, {}
    for k in dims:
        active = jnp.zeros(d).at[jnp.asarray(order[:k])].set(1.0)
        xhat = density.decode(variables, z * active, train=False)
        recons[k] = float(jnp.mean((x - xhat) ** 2))
        mu, cov = activation_statistics(iter([xhat]), feature_fn)
        fids[k] = float(frechet_distance(ref_mu, ref_cov, mu, cov))
    return recons, fids


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
        z_rows, row_labels = [], []
        for k in range(min(3, z.shape[1])):
            t = jnp.linspace(-2.0, 2.0, 64)
            zs = jnp.tile(mean_z, (64, 1)).at[:, k].set(mean_z[k] + t * std_z[k])
            curve = np.asarray(density.decode(variables, zs, train=False))
            sweeps[k] = curve
            z_rows.append(np.asarray(zs))
            row_labels.append(f"z_{k}")
            invariants[f"axis{k}_winding_xy"] = winding_number(curve[:, :2])
            invariants[f"axis{k}_curvature"] = discrete_curvature(curve)
        self._writer.write_json(f"invariants_epoch{epoch}", invariants)

        # Per-row topological battery (visualizer.py:2111-2156): winding /
        # degree / volume-distortion / metric-rank / curvature, plus genuine
        # Vietoris–Rips b0/b1 of the decoded rows (ROADMAP: "Betti via
        # persistent homology").
        z_all = np.asarray(z[:64])
        battery = per_z_invariants(
            density, variables, [z_all] + z_rows, labels=["z_all"] + row_labels
        )
        self._writer.write_json(f"topological_battery_epoch{epoch}", battery)

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
