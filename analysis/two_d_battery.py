#!/usr/bin/env python3
"""5-seed 2-D non-square quality battery — the in-container correctness oracle.

The reference's de-facto quality check for the non-square machinery is the 2-D
synthetic suite (SURVEY.md §4.3): the von-Mises-circle pullback density against
its closed form (reference cmf/visualizer.py:1575-1583) and convergence of the
sphere / fuzzy-line / sinusoid manifold runs. This script trains
``--seeds`` full runs per dataset through the public experiment API, tests
each (metrics.json), computes the von-Mises pullback KL for the circle, and
aggregates mean ± stderr into a markdown table (the reference's 5-seed
protocol, analysis/tabular_evaluate.py:21,99-108).

Per-dataset configuration follows the reference's PUBLISHED commands, not the
bare config-group defaults (which leave ``latent_dimension=2`` everywhere):

  * sphere — ``g_ij_loss=True lr=0.001 latent_dimension=3`` (README.md:49);
  * fuzzy-line-in-r4 — ``g_ij_loss=True lr=0.0005 latent_dimension=4``
    (README.md:53; the command there names "fuzzy-line" but latent 4 only
    exists for the R⁴ embedding — fuzzy-line itself is R², so it runs at its
    ambient latent 2);
  * sinusoid-1-3 — ``g_ij_loss=True lr=0.0007 likelihood_warmup=False
    latent_dimension=3`` (the README.md:62-70 sinusoid-1-6 protocol at the
    3-D embedding; latent = ambient, CMF discovers the effective dimension);
  * von-mises-circle — ``latent_dimension=1``: the 1-D chart case the
    reference's pullback/ground-truth visual oracle is built for
    (visualizer.py:1575-1583). g_ij needs latent>1, so the circle runs the
    plain RNF-style objective.

Usage:
    python analysis/two_d_battery.py [--seeds 5] [--epochs N]
        [--datasets von-mises-circle sphere fuzzy-line ...]
        [--runs-dir runs_battery] [--out RESULTS.md]

Quality metrics per run:
  * test elbo (pure likelihood, regularizers off — experiment.py:605-606)
  * test reconstruction error
  * von-mises-circle only: KL(ground truth ‖ model) along the unit circle,
    both densities normalized over the θ grid; the model restricted to the
    manifold is exp(elbo) w.r.t. the manifold volume measure.
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def von_mises_circle_kl(density, variables, num=1000):
    """KL(vonMises(κ=1, loc=π/2) ‖ p_model) on a θ grid along the unit circle.

    The model density is exp(elbo) at circle points — the reference's
    visualization likelihood (reconstruction OFF, visualizer.py:1546-1550).
    Caveat this inherits from the flat-latent topology: an ℝ chart cannot
    close the circle, so the model has a SEAM where the elbo collapses by
    tens of nats even when the angular sample distribution there is fine —
    this forward KL punishes the seam catastrophically. Report it alongside
    ``von_mises_sample_kl`` (seam-robust)."""
    import jax.numpy as jnp
    from scipy.special import i0

    theta = np.linspace(-np.pi, np.pi, num=num, endpoint=False)
    xy = np.stack([np.cos(theta), np.sin(theta)], axis=1).astype(np.float32)
    info, _ = density.elbo(
        variables, jnp.asarray(xy), train=False,
        add_reconstruction=False, likelihood_wt=1.0,
    )
    log_model = np.asarray(info["elbo"], dtype=np.float64)
    # normalize both over the grid (dθ cancels)
    log_model = log_model - (np.log(np.sum(np.exp(log_model - log_model.max())))
                             + log_model.max())
    log_gt = np.sin(theta) - np.log(2 * np.pi * i0(1.0))
    log_gt = log_gt - (np.log(np.sum(np.exp(log_gt - log_gt.max()))) + log_gt.max())
    p_gt = np.exp(log_gt)
    return float(np.sum(p_gt * (log_gt - log_model)))


def von_mises_sample_kl(density, variables, num_samples=50_000, bins=72, seed=0):
    """KL(vonMises(κ=1, loc=π/2) ‖ angle-histogram of model samples): the
    seam-robust quality number — measures whether the model's SAMPLES
    reproduce the angular law, independent of where the flat-latent chart
    places its seam. Reference scale: a uniform circle scores
    κ·I1/I0 − log I0 ≈ 0.21; an untrained model is ≫ 1."""
    import jax
    from scipy.special import i0

    s = np.asarray(density.sample(variables, jax.random.PRNGKey(seed), num_samples))
    ang = np.arctan2(s[:, 1], s[:, 0])
    counts, edges = np.histogram(ang, bins=bins, range=(-np.pi, np.pi))
    p_model = (counts + 0.5) / (counts + 0.5).sum()  # Jeffreys-smoothed
    centers = (edges[:-1] + edges[1:]) / 2
    log_gt = np.sin(centers) - np.log(2 * np.pi * i0(1.0))
    p_gt = np.exp(log_gt)
    p_gt = p_gt / p_gt.sum()
    return float(np.sum(p_gt * (np.log(p_gt) - np.log(p_model))))


def sphere_radius_mae(density, variables, num_samples=20_000, seed=0, coords=None):
    """Mean |‖x‖−1| of model samples — analytic oracle for the exact
    unit-sphere families (randomized-s2inr6-* carries the sphere in its first
    3 coordinates: pass coords=3; their data scores ≈ 1e-8). NOT valid for
    hemisphere-2-6: the reference's generator (two_d.py:14-46) composes
    hypersphere coordinates with a sin²φ term, so its data radius is
    1.17 ± 0.10 — use ``radius_w1`` there."""
    import jax

    s = np.asarray(density.sample(variables, jax.random.PRNGKey(seed), num_samples))
    if coords is not None:
        s = s[:, :coords]
    radius = np.linalg.norm(s, axis=1)
    return float(np.mean(np.abs(radius - 1.0)))


def radius_w1(density, variables, dataset, num_samples=20_000, seed=0):
    """Wasserstein-1 distance between the model's sample-radius distribution
    and the DATA's (test split, generator seed 0) — the data-anchored radius
    oracle for manifolds whose radius law is nontrivial (hemisphere-2-6)."""
    import jax
    from cmf_tpu.data.two_d import get_2d_datasets

    _, _, test_x = get_2d_datasets(dataset, seed=0)
    r_data = np.sort(np.linalg.norm(test_x, axis=1))
    s = np.asarray(density.sample(variables, jax.random.PRNGKey(seed), num_samples))
    r_model = np.sort(np.linalg.norm(s, axis=1))
    # W1 of empirical 1-D laws = mean |quantile difference|; resample both to
    # a common grid of quantiles.
    q = np.linspace(0, 1, 512)
    qd = np.quantile(r_data, q)
    qm = np.quantile(r_model, q)
    return float(np.mean(np.abs(qd - qm)))


def sinusoid_z_kl(density, variables, sigma_m=0.1, num_samples=50_000, bins=60, seed=0):
    """KL(N(0, σ_m) ‖ histogram of the model's last ambient coordinate):
    sinusoid-d'-d embeds the latent Gaussian as the trailing coordinate(s)
    (two_d.py:48-74 hstack), so the marginal law there is known in closed
    form. Jeffreys-smoothed histogram, analytic density on bin centers."""
    import jax

    s = np.asarray(density.sample(variables, jax.random.PRNGKey(seed), num_samples))
    z = s[:, -1]
    std = math.sqrt(sigma_m)
    lo, hi = -4 * std, 4 * std
    counts, edges = np.histogram(np.clip(z, lo, hi), bins=bins, range=(lo, hi))
    p_model = (counts + 0.5) / (counts + 0.5).sum()
    centers = (edges[:-1] + edges[1:]) / 2
    log_gt = -0.5 * (centers / std) ** 2
    p_gt = np.exp(log_gt)
    p_gt = p_gt / p_gt.sum()
    return float(np.sum(p_gt * (np.log(p_gt) - np.log(p_model))))


def von_mises_seam_analysis(density, variables, num=1000, bins=72,
                            num_samples=50_000, drop_bins=2, seed=0):
    """Quantify the flat-chart SEAM's contribution to the circle's
    sample-angle KL (round-3 verdict weak #4: 'seam cost real but
    unexplored'). An ℝ latent chart cannot close the circle: wherever the
    chart's two ends meet, the model under-covers a neighbourhood. This
    locates the seam as the elbo minimum over the θ grid, measures its
    width (fraction of the grid more than 10 nats below the elbo max), and
    recomputes the sample-angle KL with the ``drop_bins`` histogram bins
    nearest the seam excluded (both laws renormalized over the kept bins) —
    if the KL collapses toward the pullback KL, the gap is seam-localized.
    """
    import jax
    import jax.numpy as jnp
    from scipy.special import i0

    theta = np.linspace(-np.pi, np.pi, num=num, endpoint=False)
    xy = np.stack([np.cos(theta), np.sin(theta)], axis=1).astype(np.float32)
    info, _ = density.elbo(
        variables, jnp.asarray(xy), train=False,
        add_reconstruction=False, likelihood_wt=1.0,
    )
    elbo = np.asarray(info["elbo"], dtype=np.float64)
    seam_theta = float(theta[np.argmin(elbo)])
    seam_width_frac = float(np.mean(elbo < elbo.max() - 10.0))

    s = np.asarray(density.sample(variables, jax.random.PRNGKey(seed), num_samples))
    ang = np.arctan2(s[:, 1], s[:, 0])
    counts, edges = np.histogram(ang, bins=bins, range=(-np.pi, np.pi))
    centers = (edges[:-1] + edges[1:]) / 2
    log_gt = np.sin(centers) - np.log(2 * np.pi * i0(1.0))

    def kl(keep):
        p_model = (counts[keep] + 0.5) / (counts[keep] + 0.5).sum()
        p_gt = np.exp(log_gt[keep])
        p_gt = p_gt / p_gt.sum()
        return float(np.sum(p_gt * (np.log(p_gt) - np.log(p_model))))

    # circular distance of each bin center to the seam
    dist = np.abs(np.angle(np.exp(1j * (centers - seam_theta))))
    keep = np.ones(bins, dtype=bool)
    keep[np.argsort(dist)[:drop_bins]] = False  # drop the nearest bins
    return {
        "seam_theta": seam_theta,
        "seam_width_frac": seam_width_frac,
        "sample_angle_kl": kl(np.ones(bins, dtype=bool)),
        "sample_angle_kl_ex_seam": kl(keep),
        "dropped_bins": int(drop_bins),
    }


def record_provenance(results):
    """Stamp the producing backend into metrics.json so mixed TPU/CPU-lane
    batteries stay attributable (round-3 advisor finding)."""
    import jax

    results["backend"] = jax.default_backend()
    results["device_kind"] = getattr(jax.devices()[0], "device_kind", "unknown")
    return results


def _setup_compile_cache():
    """Persistent XLA compile cache (as bench.py): the battery runs the same
    jit variants across 5 seeds x 4 datasets — without this every process
    restart pays the full tunnel compile again."""
    import jax

    cache = os.path.join(os.path.expanduser("~/.cache/cmf_tpu_xla"), jax.default_backend())
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


# Reference-published per-dataset overrides (see module docstring for the
# README.md:49,53,62-70 citations).
#
# The circle additionally needs the anti-collapse settings the reference's
# Appendix-F.1 grid searches over (README.md:57: the published 2-D non-square
# runs grid over regularization_param / likelihood_warmup / lr): with
# likelihood on from epoch 0 and reg_param=1, a 1-D chart can cheat the elbo
# by collapsing the decoder (log|JᵀJ| → −∞ inflates −½·log-det faster than
# the O(1) reconstruction term penalizes it — verified: such a run reaches
# elbo ≈ +8.4 with all samples on one point). Warmup (reconstruction-only
# epochs first, reference tabular.py:298-354 uses the same defense) plus the
# tabular/image-scale reg_param=50 locks the chart in before likelihood
# introduction.
PROTOCOL = {
    "von-mises-circle": {
        "latent_dimension": 1,
        "likelihood_warmup": True,
        "regularization_param": 50,
    },
    "sphere": {"g_ij_loss": True, "lr": 0.001, "latent_dimension": 3},
    "fuzzy-line": {"g_ij_loss": True, "lr": 0.0005, "latent_dimension": 2},
    "fuzzy-line-in-r4": {"g_ij_loss": True, "lr": 0.0005, "latent_dimension": 4},
    "sinusoid-1-3": {
        "g_ij_loss": True,
        "lr": 0.0007,
        "likelihood_warmup": False,
        "latent_dimension": 3,
    },
    # Paper synthetic families (README.md:62-70 sinusoid protocol transferred;
    # the s2inr6 noise family has no published command — sphere-like lr).
    "sinusoid-1-6": {
        "g_ij_loss": True,
        "lr": 0.0007,
        "likelihood_warmup": False,
        "latent_dimension": 6,
    },
    "hemisphere-2-6": {"g_ij_loss": True, "lr": 0.001, "latent_dimension": 6},
    "randomized-s2inr6-003": {"g_ij_loss": True, "lr": 0.001, "latent_dimension": 6},
}

# Post-run analytic oracles per dataset (beyond the circle KLs): callables
# (density, variables) -> float, merged into metrics.json.
ORACLES = {
    "hemisphere-2-6": {"radius_w1": lambda d, v: radius_w1(d, v, "hemisphere-2-6")},
    "randomized-s2inr6-003": {
        "sphere_radius_mae": lambda d, v: sphere_radius_mae(d, v, coords=3)
    },
    "sinusoid-1-6": {"sinusoid_z_kl": lambda d, v: sinusoid_z_kl(d, v)},
    "sinusoid-1-3": {"sinusoid_z_kl": lambda d, v: sinusoid_z_kl(d, v)},
}


def run_one(dataset, seed, epochs, runs_dir, overrides=None, tail=None):
    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training import load_run, test_and_visualize, train

    config = get_config(dataset, "non-square", use_baseline=False)
    config = {"model": "non-square", "dataset": dataset, **config}
    config.update(PROTOCOL.get(dataset, {}))
    if overrides:
        config.update(overrides)
    config = expand_grid(config)[0]
    config["seed"] = seed
    if epochs is not None:
        # Scale the likelihood-warmup schedule with the epoch override: the
        # trainer derives early_stopping_start_epoch from likelihood_warmup_end
        # (objectives.py:40-51), so on shortened runs the warmup must shrink
        # proportionally or full likelihood weight (and early stopping) would
        # never activate.
        scale = epochs / config["max_epochs"]
        for k in ("likelihood_warmup_start", "likelihood_warmup_end"):
            if config.get(k):
                config[k] = max(1, int(round(config[k] * scale)))
        config["max_epochs"] = epochs
    config["logdir_root"] = runs_dir
    config["rundir_tail"] = tail if tail is not None else f"_seed{seed}"

    setup = train(config)
    run_dir = setup["writer"].logdir
    results = test_and_visualize(config, run_dir, overwrite=True)

    record_provenance(results)
    if dataset == "von-mises-circle" or dataset in ORACLES:
        loaded = load_run(run_dir)
        if dataset == "von-mises-circle":
            results["pullback_kl"] = von_mises_circle_kl(loaded["density"], loaded["variables"])
            # seam analysis includes sample_angle_kl (same 50k draw, same
            # seed as von_mises_sample_kl) — one sampling pass, one merge
            results.update(
                von_mises_seam_analysis(loaded["density"], loaded["variables"])
            )
        for name, fn in ORACLES.get(dataset, {}).items():
            results[name] = fn(loaded["density"], loaded["variables"])
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(results, f, indent=4)
    return run_dir, results


def aggregate(rows):
    """mean ± stderr per metric, NaN-excluded (tabular_evaluate.py:99-108)."""
    out = {}
    keys = set().union(*[set(r) for r in rows])
    for k in sorted(keys):
        vals = np.array([r[k] for r in rows if k in r and np.isfinite(r.get(k, np.nan))])
        if len(vals) == 0:
            continue
        stderr = float(np.std(vals, ddof=1) / math.sqrt(len(vals))) if len(vals) > 1 else 0.0
        out[k] = (float(np.mean(vals)), stderr, len(vals))
    return out


def reaggregate(runs_dir, datasets):
    """Rebuild per-dataset rows from existing run dirs: reload each run,
    recompute the circle KLs with the current metric code, and patch its
    metrics.json — lets the table be regenerated without retraining."""
    from cmf_tpu.training import load_run

    table_rows = {}
    for dataset in datasets:
        ddir = os.path.join(runs_dir, dataset)
        if not os.path.isdir(ddir):
            continue
        rows = []
        for run in sorted(os.listdir(ddir)):
            run_dir = os.path.join(ddir, run)
            mpath = os.path.join(run_dir, "metrics.json")
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                results = json.load(f)
            if dataset == "von-mises-circle" or dataset in ORACLES:
                loaded = load_run(run_dir)
                if dataset == "von-mises-circle":
                    results["pullback_kl"] = von_mises_circle_kl(
                        loaded["density"], loaded["variables"]
                    )
                    results.update(
                        von_mises_seam_analysis(
                            loaded["density"], loaded["variables"]
                        )
                    )
                for name, fn in ORACLES.get(dataset, {}).items():
                    results[name] = fn(loaded["density"], loaded["variables"])
                with open(mpath, "w") as f:
                    json.dump(results, f, indent=4)
            rows.append(results)
            print(json.dumps({"dataset": dataset, "run": run_dir,
                              **{k: v for k, v in results.items()
                                 if isinstance(v, (int, float))}}), flush=True)
        table_rows[dataset] = rows
    return table_rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override max_epochs (default: config schedule)")
    ap.add_argument("--datasets", nargs="+",
                    default=["von-mises-circle", "sphere", "fuzzy-line",
                             "fuzzy-line-in-r4", "sinusoid-1-3",
                             "randomized-s2inr6-003"])
    ap.add_argument("--runs-dir", default="runs_battery")
    ap.add_argument("--out", default=None, help="markdown output path")
    ap.add_argument("--reaggregate", action="store_true",
                    help="skip training; rebuild the table from --runs-dir")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    # "loss" is the 2-D test metric (pure -elbo with regularizers off,
    # experiment.py:605-606)
    scalar_keys = ("loss", "elbo", "log-prob", "reconstruction-error", "pullback_kl",
                   "sample_angle_kl", "sphere_radius_mae", "sinusoid_z_kl", "radius_w1")

    def flatten(results):
        return {
            k: float(v)
            for k, v in results.items()
            if isinstance(v, (int, float, np.floating, np.integer))
            and not isinstance(v, bool)
            and any(s in k for s in scalar_keys)
        }

    table = {}
    if args.reaggregate:
        for dataset, rows in reaggregate(args.runs_dir, args.datasets).items():
            table[dataset] = aggregate([flatten(r) for r in rows])
    else:
        for dataset in args.datasets:
            rows = []
            for seed in range(args.seeds):
                run_dir, results = run_one(dataset, seed, args.epochs, args.runs_dir)
                flat = flatten(results)
                rows.append(flat)
                print(json.dumps({"dataset": dataset, "seed": seed, "run": run_dir, **flat}),
                      flush=True)
            table[dataset] = aggregate(rows)

    lines = [
        "| dataset | metric | mean ± stderr | n |",
        "|---|---|---|---|",
    ]
    for dataset, agg in table.items():
        for metric, (mean, stderr, n) in agg.items():
            lines.append(f"| {dataset} | {metric} | {mean:.4f} ± {stderr:.4f} | {n} |")
    md = "\n".join(lines)
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md + "\n")
    return table


if __name__ == "__main__":
    main()
