#!/usr/bin/env python3
"""Explain the von-Mises-circle seed-3 outlier (round-4 verdict weak #4 /
next-round #8).

The round-3 battery's seam decomposition attributes ~1/3 of the circle's
sample-angle KL to 2/72 bins at the flat-chart seam for four of five seeds —
but seed 3 (committed metrics: sample KL 0.291, ex-seam 0.232, i.e. NOT
seam-localized) was left unexplained. The committed battery_r03 run dirs
carry config+metrics only (no checkpoint), so this probe retrains the exact
run (same config.json incl. seed), verifies it reproduces the outlier
signature, then localizes the misfit:

  * elbo(θ) along the unit circle vs the closed-form von-Mises log-density
    (the reference's visual oracle, ref visualizer.py:1575-1583),
  * the 72-bin angular sample histogram vs ground truth with per-bin
    KL contributions, sorted — is the ex-seam mass deficit localized
    (secondary seam) or diffuse (ordinary density misfit)?
  * an optional --double-epochs rerun of the same seed to test "curable by
    longer training".

Artifacts: a two-panel figure (elbo-vs-θ + per-bin KL) and a JSON summary,
both into --out-dir (committed as evidence for the RESULTS.md paragraph).

Usage:
    python analysis/circle_seed3_probe.py \
        --ref-run analysis/battery_r03/von-mises-circle/Aug20_19-58-50_seed3 \
        --out-dir analysis/circle_seed3_r5 [--double-epochs]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.two_d_battery import (  # noqa: E402
    _setup_compile_cache,
    record_provenance,
    von_mises_circle_kl,
    von_mises_seam_analysis,
)


def angular_profile(density, variables, num=1000, bins=72, num_samples=50_000,
                    seed=0):
    """elbo(θ) on the circle + per-bin sample-KL contributions."""
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

    s = np.asarray(density.sample(variables, jax.random.PRNGKey(seed), num_samples))
    ang = np.arctan2(s[:, 1], s[:, 0])
    counts, edges = np.histogram(ang, bins=bins, range=(-np.pi, np.pi))
    centers = (edges[:-1] + edges[1:]) / 2
    p_model = (counts + 0.5) / (counts + 0.5).sum()
    log_gt = np.sin(centers) - np.log(2 * np.pi * i0(1.0))
    p_gt = np.exp(log_gt)
    p_gt = p_gt / p_gt.sum()
    contrib = p_gt * (np.log(p_gt) - np.log(p_model))
    return {
        "theta": theta, "elbo": elbo, "bin_centers": centers,
        "p_model": p_model, "p_gt": p_gt, "kl_contrib": contrib,
        "radius_mean": float(np.mean(np.linalg.norm(s, axis=1))),
        "radius_std": float(np.std(np.linalg.norm(s, axis=1))),
    }


def retrain(ref_config, out_runs, epochs=None, tail="_probe"):
    from cmf_tpu.training import load_run, train

    config = dict(ref_config)
    config.pop("logdir_root", None)
    config["logdir_root"] = out_runs
    config["rundir_tail"] = tail
    if epochs:
        config["max_epochs"] = epochs
    setup = train(config)
    run_dir = setup["writer"].logdir
    loaded = load_run(run_dir)
    return run_dir, loaded["density"], loaded["variables"]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref-run", required=True)
    ap.add_argument("--out-dir", default="analysis/circle_seed3_r5")
    ap.add_argument("--runs-dir", default="runs_circle_probe")
    ap.add_argument("--double-epochs", action="store_true")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    with open(os.path.join(args.ref_run, "config.json")) as f:
        ref_config = json.load(f)
    with open(os.path.join(args.ref_run, "metrics.json")) as f:
        ref_metrics = json.load(f)

    os.makedirs(args.out_dir, exist_ok=True)
    summary = {"ref_run": args.ref_run, "ref_metrics": ref_metrics,
               "config_seed": ref_config.get("seed"),
               "max_epochs": ref_config.get("max_epochs")}

    run_dir, density, variables = retrain(ref_config, args.runs_dir)
    seam = von_mises_seam_analysis(density, variables)
    prof = angular_profile(density, variables)
    summary["retrained"] = {
        "run": run_dir,
        "pullback_kl": von_mises_circle_kl(density, variables),
        **seam,
        "radius_mean": prof["radius_mean"],
        "radius_std": prof["radius_std"],
    }
    record_provenance(summary["retrained"])

    # localization: sorted per-bin KL contributions, seam distance per bin
    order = np.argsort(-prof["kl_contrib"])
    seam_theta = seam["seam_theta"]
    dist = np.abs(np.angle(np.exp(1j * (prof["bin_centers"] - seam_theta))))
    bins_sorted = [
        {
            "theta": float(prof["bin_centers"][i]),
            "kl_contrib": float(prof["kl_contrib"][i]),
            "p_model": float(prof["p_model"][i]),
            "p_gt": float(prof["p_gt"][i]),
            "seam_dist_rad": float(dist[i]),
        }
        for i in order[:10]
    ]
    summary["top_bins"] = bins_sorted
    total_kl = float(prof["kl_contrib"].sum())
    top5 = float(np.sort(prof["kl_contrib"])[-5:].sum())
    summary["kl_total"] = total_kl
    summary["kl_top5_share"] = top5 / total_kl if total_kl > 0 else None

    if args.double_epochs:
        run2, density2, variables2 = retrain(
            ref_config, args.runs_dir,
            epochs=2 * ref_config["max_epochs"], tail="_probe2x",
        )
        seam2 = von_mises_seam_analysis(density2, variables2)
        summary["retrained_2x_epochs"] = {
            "run": run2,
            "pullback_kl": von_mises_circle_kl(density2, variables2),
            **seam2,
        }

    # figure: elbo-vs-theta + per-bin KL
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.special import i0

    fig, axes = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
    log_gt = np.sin(prof["theta"]) - np.log(2 * np.pi * i0(1.0))
    lm = prof["elbo"] - prof["elbo"].max() + log_gt.max()
    axes[0].plot(prof["theta"], log_gt, label="von-Mises log-density (gt)")
    axes[0].plot(prof["theta"], lm, label="model elbo (shifted)", alpha=0.8)
    axes[0].axvline(seam_theta, color="r", ls="--", label="seam (elbo min)")
    axes[0].set_ylabel("log-density (nats)")
    axes[0].set_ylim(log_gt.min() - 5, log_gt.max() + 1)
    axes[0].legend(fontsize=8)
    axes[1].bar(prof["bin_centers"], prof["kl_contrib"],
                width=2 * np.pi / 72, color="tab:blue")
    axes[1].axvline(seam_theta, color="r", ls="--")
    axes[1].set_xlabel("θ")
    axes[1].set_ylabel("per-bin KL contribution")
    fig.suptitle(f"circle seed {ref_config.get('seed')} probe "
                 f"(sample KL {seam['sample_angle_kl']:.3f}, "
                 f"ex-seam {seam['sample_angle_kl_ex_seam']:.3f})")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "seed3_profile.pdf"))
    fig.savefig(os.path.join(args.out_dir, "seed3_profile.png"), dpi=110)

    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in summary.items()
                      if k in ("retrained", "kl_total", "kl_top5_share",
                               "retrained_2x_epochs")}, indent=2, default=float))
    return summary


if __name__ == "__main__":
    main()
