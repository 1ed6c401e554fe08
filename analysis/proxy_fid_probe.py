#!/usr/bin/env python3
"""Does proxy-FID track model quality? (round-3 verdict "weak" #5)

In-container image runs fall back to the deterministic random-conv proxy
feature extractor (eval/inception.py) and FID-as-validation then makes
early-stopping / best-checkpoint decisions on that proxy signal
(trainer.py:367-371, mirroring reference cmf/trainer.py FID-as-valid).
Round 3 flagged that the proxy's correlation with model quality was
unmeasured; round 4 added the config warning. This probe adds the
measurement the verdict asked for.

Real InceptionV3 FID cannot be computed here (no weights, zero egress), so
the probe measures the thing model selection actually needs: does proxy-FID
RANK model quality the same way the exact likelihood does? Protocol:

1. Train one synthetic-mnist non-square run at the ab_battery protocol
   (exact-Gram path, d=10 — the config family whose early stopping would
   ride the proxy).
2. Build a degradation ladder: params_a = (1-a)*trained + a*fresh_init for
   a in ALPHAS (trained batch-norm state kept fixed — the ladder degrades
   the weights, matching what checkpoint selection chooses between).
3. At every rung compute (a) proxy-FID of 2560 model samples against the
   train-set reference statistics — the exact production pipeline
   (eval/fid.get_fid_function + eval/inception.get_feature_fn), and
   (b) the exact test likelihood term (elbo with add_reconstruction=False)
   plus the reconstruction error, both unavailable-to-FID ground truth.
4. Report Spearman rank correlation of proxy-FID vs each quality signal
   over the ladder, plus the data-vs-data FID floor (train-half vs
   train-half, train vs test) that a "converged" reading should approach.

A proxy fit for model selection must show strong positive rank correlation
with -likelihood (FID up when quality down) and a rung-0 FID near the data
floor. fid_dims is 512 here (not the production 2048) purely to keep the
host-side 2048x2048 scipy sqrtm out of the probe's budget; the extractor
family is identical.

Usage:
    python analysis/proxy_fid_probe.py [--seed 0] [--runs-dir runs_proxy]
        [--run-dir <existing>] [--out analysis/proxy_fid_probe_r04.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analysis.ab_battery import PROTOCOL  # noqa: E402
from analysis.two_d_battery import _setup_compile_cache, record_provenance  # noqa: E402

ALPHAS = [0.0, 0.02, 0.05, 0.1, 0.2, 0.4, 0.7, 1.0]
FID_CFG = {"num_fid_samples": 2560, "test_batch_size": 256, "fid_dims": 512}


def train_probe_run(seed, runs_dir, max_epochs):
    from cmf_tpu.config import expand_grid, get_config
    from cmf_tpu.training import train

    config = get_config("mnist", "non-square", use_baseline=False)
    config = {"model": "non-square", "dataset": "mnist", **config}
    config.update(PROTOCOL["mnist"])
    config.update({"g_ij_loss": True, "max_epochs": max_epochs})
    config = expand_grid(config)[0]
    config["seed"] = seed
    config["logdir_root"] = runs_dir
    config["rundir_tail"] = f"_proxyprobe_seed{seed}"
    setup = train(config)
    return setup["writer"].logdir


def evaluate_ladder(run_dir, alphas, seed, fid_cfg=None, quality_batches=None):
    import jax
    import jax.numpy as jnp

    from cmf_tpu.eval.fid import (
        activation_statistics,
        frechet_distance,
        get_fid_function,
    )
    from cmf_tpu.eval.inception import get_feature_fn
    from cmf_tpu.training import load_run

    fid_cfg = fid_cfg or FID_CFG
    loaded = load_run(run_dir)
    density, variables = loaded["density"], loaded["variables"]
    trainer = loaded["trainer"]
    feature_fn = get_feature_fn(fid_cfg)
    fid_fn = get_fid_function(fid_cfg, trainer.train_loader, feature_fn)

    # Data-vs-data floors: what a perfect model's proxy-FID would read.
    x_train = np.asarray(trainer.train_loader.x)
    x_test = np.asarray(trainer.test_loader.x)

    def _stats(arr):
        return activation_statistics(
            iter([jnp.asarray(arr[i : i + 256]) for i in range(0, len(arr), 256)]),
            feature_fn,
        )
    half = len(x_train) // 2
    mu_a, cov_a = _stats(x_train[:half])
    mu_b, cov_b = _stats(x_train[half : 2 * half])
    mu_tr, cov_tr = _stats(x_train)
    mu_te, cov_te = _stats(x_test)

    # 750-1500 samples against 512-dim features: near-singular covariances,
    # handled by frechet_distance's escalating jitter. The floors are
    # small-sample-biased indicators, not production FID values.
    floors = {
        "fid_train_half_vs_half": frechet_distance(mu_a, cov_a, mu_b, cov_b),
        "fid_train_vs_test": frechet_distance(mu_tr, cov_tr, mu_te, cov_te),
    }

    fresh = density.init(jax.random.PRNGKey(seed + 12345))

    @jax.jit
    def batch_quality(vars_, x, rng):
        lik, _ = density.elbo(vars_, x, rng=rng, train=False, add_reconstruction=False)
        full, _ = density.elbo(vars_, x, rng=rng, train=False)
        return jnp.mean(lik["elbo"]), jnp.mean(full["elbo"])

    bsz = 250
    n_batches = len(x_test) // bsz
    if quality_batches is not None:
        n_batches = min(n_batches, quality_batches)
    x_eval = jnp.asarray(x_test[: n_batches * bsz])

    rows = []
    for alpha in alphas:
        params_a = jax.tree_util.tree_map(
            lambda t, f: (1.0 - alpha) * t + alpha * f,
            variables["params"],
            fresh["params"],
        )
        vars_a = dict(variables, params=params_a)
        fid = float(fid_fn(density, vars_a, jax.random.PRNGKey(seed + 777)))
        liks, fulls = [], []
        for i in range(n_batches):
            l, f = batch_quality(
                vars_a, x_eval[i * bsz : (i + 1) * bsz], jax.random.PRNGKey(i)
            )
            liks.append(float(l))
            fulls.append(float(f))
        row = {
            "alpha": alpha,
            "proxy_fid": fid,
            "test_neg_likelihood": -float(np.mean(liks)),
            "test_neg_elbo": -float(np.mean(fulls)),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows, floors, fid_fn.feature_extractor


def _midranks(v):
    """Average (mid) ranks — ties share the mean of their rank positions,
    matching scipy.stats.rankdata(method='average'). Double-argsort assigns
    ties ARBITRARY distinct ranks and would silently bias rho when the FID
    ladder plateaus (round-4 advisor finding)."""
    v = np.asarray(v, dtype=np.float64)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    i = 0
    while i < len(v):
        j = i
        while j + 1 < len(v) and v[order[j + 1]] == v[order[i]]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0
        i = j + 1
    return ranks


def spearman(x, y):
    """Spearman rho over finite pairs (scipy-free; ladders are tiny).
    Ties are handled as midranks (scipy 'average' semantics)."""
    x, y = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    m = np.isfinite(x) & np.isfinite(y)
    if m.sum() < 3:
        return float("nan"), int(m.sum())
    c = np.corrcoef(_midranks(x[m]), _midranks(y[m]))[0, 1]
    return float(c), int(m.sum())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--runs-dir", default="runs_proxy")
    ap.add_argument("--run-dir", default=None, help="reuse an existing run")
    ap.add_argument("--max-epochs", type=int, default=45)
    ap.add_argument("--alphas", type=float, nargs="+", default=ALPHAS)
    ap.add_argument("--out", default="analysis/proxy_fid_probe_r04.json")
    args = ap.parse_args(argv)
    _setup_compile_cache()

    run_dir = args.run_dir or train_probe_run(args.seed, args.runs_dir, args.max_epochs)
    rows, floors, extractor = evaluate_ladder(run_dir, args.alphas, args.seed)

    fids = [r["proxy_fid"] for r in rows]
    rho_lik, n_lik = spearman(fids, [r["test_neg_likelihood"] for r in rows])
    rho_elbo, n_elbo = spearman(fids, [r["test_neg_elbo"] for r in rows])
    result = {
        "run_dir": run_dir,
        "seed": args.seed,
        "feature_extractor": extractor,
        "fid_cfg": FID_CFG,
        "ladder": rows,
        "floors": floors,
        "spearman_fid_vs_neg_likelihood": rho_lik,
        "spearman_fid_vs_neg_elbo": rho_elbo,
        "n_finite_pairs": {"neg_likelihood": n_lik, "neg_elbo": n_elbo},
    }
    record_provenance(result)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in (
        "spearman_fid_vs_neg_likelihood", "spearman_fid_vs_neg_elbo", "floors"
    )}), flush=True)


if __name__ == "__main__":
    main()
