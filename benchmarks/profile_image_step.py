#!/usr/bin/env python3
"""Per-op profile of the mnist non-square train step (the image hot path).

Round-3 diagnosis (ROADMAP): the ~60 ms mnist step carries only ~1.5 ms of
conv FLOPs — the rest is a long tail of small glue ops. This script turns
that inference into a measured, committed breakdown: it captures a TPU
profiler trace of the steady-state scanned train step and aggregates
device self-time per HLO category / per op via xprof's hlo_stats, printing
the top offenders and a category rollup. The output drives (and later
verifies) the image-path fusion work.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_image_step.py
        [--steps 30] [--batch 50] [--latent 20] [--out PROFILE_image.json]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(batch, latent):
    import jax
    import jax.numpy as jnp
    import optax

    from cmf_tpu.config import expand_grid, get_config, get_schema
    from cmf_tpu.models import get_density

    config = get_config("mnist", "non-square", use_baseline=False)
    config = expand_grid(config)[0]
    config.update({"seed": 0, "latent_dimension": latent})
    density = get_density(get_schema(config), x_shape=(1, 28, 28))
    variables = density.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-4)
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

    return train_steps, variables, opt_state


def hlo_breakdown(trace_dir, top=25):
    """Aggregate device self-time by HLO category from the captured xplane
    (xprof hlo_stats: Google-Charts JSON, cols include category /
    total_self_time / bound_by / model_flop_rate)."""
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    ops = []
    for row in d.get("rows", []):
        v = [c.get("v") for c in row["c"]]
        ops.append(
            {
                "category": v[idx["category"]],
                "op": v[idx["hlo_op_name"]],
                "expr": (v[idx["hlo_op_expression"]] or "")[:120],
                "occurrences": v[idx["occurrences"]],
                "self_time_us": v[idx["total_self_time"]],
                "self_pct": v[idx["total_self_time_percent"]],
                "flop_rate": v[idx["model_flop_rate"]],
                "bound_by": v[idx["bound_by"]],
            }
        )
    by_cat = {}
    for o in ops:
        c = by_cat.setdefault(o["category"], {"self_time_us": 0.0, "n": 0})
        c["self_time_us"] += float(o["self_time_us"] or 0)
        c["n"] += int(o["occurrences"] or 0)
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1]["self_time_us"])
    total = sum(c["self_time_us"] for _, c in cats) or 1.0
    print("\n=== self-time by HLO category ===")
    for name, c in cats:
        print(f"{name:30s} {c['self_time_us']/1e3:9.2f} ms "
              f"({100*c['self_time_us']/total:5.1f}%)  ops={c['n']}")
    ops.sort(key=lambda o: -float(o["self_time_us"] or 0))
    print(f"\n=== top {top} ops by self-time ===")
    for o in ops[:top]:
        print(f"{float(o['self_time_us'] or 0)/1e3:8.2f} ms  {o['category']:16s} "
              f"x{o['occurrences']:>4} {str(o['bound_by']):12s} {o['op']}")
    return {"by_category": dict(cats), "top_ops": ops[: top * 2]}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--latent", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/cmf_tpu_image_profile")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import time

    import jax

    train_steps, variables, opt_state = build_step(args.batch, args.latent)
    rng = jax.random.PRNGKey(1)
    xs = jax.numpy.asarray(
        np.random.default_rng(0).uniform(0, 255, (args.steps, args.batch, 1, 28, 28)),
        jax.numpy.float32,
    )
    # compile + warm up
    carry, losses = train_steps(variables["params"], variables["state"], opt_state, rng, xs)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    carry, losses = train_steps(variables["params"], variables["state"], opt_state, rng, xs)
    jax.block_until_ready(losses)
    wall = time.perf_counter() - t0
    ms_per_step = wall / args.steps * 1e3
    print(f"steady-state: {ms_per_step:.2f} ms/step "
          f"({args.batch / ms_per_step * 1e3:.1f} samples/s)")

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        carry, losses = train_steps(
            variables["params"], variables["state"], opt_state, rng, xs
        )
        jax.block_until_ready(losses)

    summary = hlo_breakdown(args.trace_dir)
    summary["ms_per_step"] = round(ms_per_step, 3)
    summary["batch"] = args.batch
    summary["latent"] = args.latent
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
