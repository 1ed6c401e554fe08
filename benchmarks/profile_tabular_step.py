#!/usr/bin/env python3
"""Per-op profile + roofline accounting of the flagship tabular train step.

Round-4 verdict #4: the image path has a committed per-op profile with an
irreducibility argument (PROFILE_image_r4.json — conv fusions 94.4% of the
step), but the flagship miniboone exact-Cholesky path (BENCH primary:
batch 400, D=43, d=21, SURVEY.md §3.2 hot path) was only asserted fast via
a relative number. This script produces the same evidence for it:

  * xprof hlo_stats per-op/per-category device self-time breakdown of the
    steady-state scanned train step (identical program to bench.py's
    `_train_throughput`),
  * an analytic FLOP budget for the step's algorithmically-necessary work
    (coupler matmuls over the 10+5 coupling layers forward+backward, the
    d-column tangent replay, the B·d²·D Gram build, the B·d³/3 Cholesky),
  * measured utilization: (analytic FLOPs)/(step time) against the v5e
    MXU peak, plus xprof's own per-op flop rates and bound_by tags for the
    top fusions — i.e. is the remaining time arithmetic, bandwidth, or
    neither (dispatch/fragmentation)?

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python \
        benchmarks/profile_tabular_step.py [--steps 50] [--batch 400] \
        [--out PROFILE_tabular_r5.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.profile_image_step import hlo_breakdown  # noqa: E402

# TPU v5e (v5 lite) peaks per chip (public spec): 197 TFLOP/s bf16,
# ~98.3 TFLOP/s fp32-via-MXU-passes is not published — XLA runs fp32 matmuls
# as 3-6 bf16 passes; we report utilization against the bf16 peak (hard
# ceiling) and against 1/4 of it (the realistic fp32-HIGHEST envelope for
# these shapes).
V5E_BF16_PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def build_step(batch):
    import jax
    import jax.numpy as jnp
    import optax

    from cmf_tpu.config import expand_grid, get_config, get_schema
    from cmf_tpu.models import get_density

    config = get_config("miniboone", "non-square", use_baseline=False)
    config = expand_grid(config)[0]
    config.update({"seed": 0, "train_batch_size": batch})
    density = get_density(get_schema(config), x_shape=(43,))
    variables = density.init(jax.random.PRNGKey(0))
    opt = optax.adam(config["lr"])
    opt_state = opt.init(variables["params"])

    @jax.jit
    def train_steps(params, state, opt_state, rng, xs):
        def body(carry, x):
            params, state, opt_state, rng = carry
            rng, step_rng = jax.random.split(rng)

            def loss_fn(p):
                info, new_state = density.elbo(
                    {"params": p, "state": state}, x, rng=step_rng, train=True,
                    likelihood_wt=1.0, add_reconstruction=True,
                )
                return -jnp.mean(info["elbo"]), new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state, rng), loss

        carry, losses = jax.lax.scan(body, (params, state, opt_state, rng), xs)
        return carry, losses

    return train_steps, variables, opt_state, config


def analytic_flops(config, batch, d=21, big_d=43):
    """Algorithmically-necessary MXU FLOPs per train step (multiply+add = 2).

    Counted from the config's layer roster (defaults/tabular.py — the same
    schema the step compiles): every coupler MLP matmul runs once in the
    primal encoder pass, once per tangent column in the d-column JVP replay
    (decoder side), and twice in the backward pass (grad-x and grad-w), with
    the replay's backward doubling the tangent share. This is a floor — XLA
    adds elementwise/copy traffic — so utilization computed from it is
    conservative (true MXU utilization is at least this)."""
    ch = config.get("coupler_hidden_channels") or [32, 32]
    n_layers = config.get("num_density_layers", 10)
    p_ch = config.get("prior_hidden_channels") or [32, 32]
    p_layers = config.get("prior_num_density_layers", 5)

    def mlp_flops(in_dim, hidden, out_dim, b):
        dims = [in_dim] + list(hidden) + [out_dim]
        return sum(2 * b * dims[i] * dims[i + 1] for i in range(len(dims) - 1))

    # ambient couplers: half-split of D=43 → in 21/22, shift+log-scale out
    amb = n_layers * mlp_flops(big_d // 2, ch, 2 * (big_d - big_d // 2), batch)
    # latent prior couplers on d=21
    pri = p_layers * mlp_flops(d // 2, p_ch, 2 * (d - d // 2), batch)
    primal = amb + pri
    # tangent replay: decoder-side couplers once per column (forward),
    # and the loss backward differentiates through it (~2x more)
    tangent_fwd = d * amb
    backward = 2 * (primal + tangent_fwd)
    gram = 2 * batch * d * d * big_d          # (d,B,D) x (d,B,D) -> (B,d,d)
    chol = batch * d ** 3 // 3
    total = primal + tangent_fwd + backward + gram + chol
    return {
        "primal_coupler_flops": primal,
        "tangent_replay_flops": tangent_fwd,
        "backward_flops": backward,
        "gram_flops": gram,
        "cholesky_flops": chol,
        "total_flops": total,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=400)
    ap.add_argument("--trace-dir", default="/tmp/cmf_tpu_tabular_profile")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    train_steps, variables, opt_state, config = build_step(args.batch)
    rng = jax.random.PRNGKey(1)
    xs = jax.numpy.asarray(
        np.random.default_rng(0).normal(size=(args.steps, args.batch, 43)),
        jax.numpy.float32,
    )
    carry, losses = train_steps(variables["params"], variables["state"], opt_state, rng, xs)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    carry, losses = train_steps(variables["params"], variables["state"], opt_state, rng, xs)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0
    ms_per_step = wall / args.steps * 1e3
    samples_per_s = args.batch / ms_per_step * 1e3
    print(f"steady-state: {ms_per_step:.3f} ms/step ({samples_per_s:.0f} samples/s)")

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        carry, losses = train_steps(
            variables["params"], variables["state"], opt_state, rng, xs
        )
        jax.block_until_ready(losses)

    summary = hlo_breakdown(args.trace_dir)
    summary["ms_per_step"] = round(ms_per_step, 4)
    summary["samples_per_s_per_chip"] = round(samples_per_s, 1)
    summary["batch"] = args.batch

    fl = analytic_flops(config, args.batch)
    step_s = ms_per_step / 1e3
    achieved_tflops = fl["total_flops"] / step_s / 1e12
    summary["roofline"] = {
        **fl,
        "achieved_tflops_analytic": round(achieved_tflops, 4),
        "pct_of_bf16_peak": round(100 * achieved_tflops / V5E_BF16_PEAK_TFLOPS, 3),
        "pct_of_fp32_envelope": round(
            100 * achieved_tflops / (V5E_BF16_PEAK_TFLOPS / 4), 3
        ),
        "note": (
            "analytic FLOPs are the algorithmic floor (coupler matmuls "
            "fwd/tangent/bwd + Gram + Cholesky); shapes are MXU-hostile "
            "(K<=32 contractions at d=21/D=43) — see summary ratios for "
            "where the time actually goes"
        ),
    }
    # device-time totals + memory/compute bound split from xprof
    total_us = sum(c["self_time_us"] for c in summary["by_category"].values())
    summary["roofline"]["device_time_per_step_ms"] = round(
        total_us / 1e3 / args.steps, 4
    )
    print(json.dumps(summary["roofline"], indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
