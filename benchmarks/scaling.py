#!/usr/bin/env python3
"""Data-parallel scaling harness: samples/s at 1..N devices.

Measures the jitted non-square train step with the batch sharded over a
``data`` mesh of increasing size (BASELINE.json: ">=80% linear samples/s
scaling efficiency"). On a single-chip host, run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`` to
validate the machinery; on a pod slice it measures real ICI scaling.

NOTE on interpreting CPU-mesh numbers (SCALING_cpu8.json): a host mesh has
no real interconnect — all "devices" share the same memory bus and two
physical cores — so its efficiency curve validates the sharding MACHINERY,
not the >=80%-at-N-chips ICI claim. The committed 8-"device" point also
runs only 50 rows/device, small enough that per-dispatch overhead bends the
trend; treat it as a plumbing check until a real pod slice is available.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmf_tpu.config import expand_grid, get_config, get_schema
from cmf_tpu.models import get_density


def measure(n_devices, per_device_batch=512, dim=43, n_steps=20, depth=None):
    config = expand_grid(get_config("miniboone", "non-square", use_baseline=False))[0]
    config["seed"] = 0
    if depth is not None:  # reduced geometry for CPU-mesh machinery checks
        config.update({"num_density_layers": depth, "prior_num_density_layers": 2,
                       "latent_dimension": 4, "coupler_hidden_channels": [16] * 2,
                       "prior_hidden_channels": [8] * 2})
    density = get_density(get_schema(config), x_shape=(dim,))
    variables = density.init(jax.random.PRNGKey(0))
    opt = optax.adam(config["lr"])

    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
    data_sh = NamedSharding(mesh, P(None, "data"))
    repl = NamedSharding(mesh, P())
    batch = per_device_batch * n_devices

    @jax.jit
    def epoch(carry, batches):
        def body(carry, x):
            params, state, opt_state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                info, ns = density.elbo(
                    {"params": p, "state": state}, x, rng=sub, train=True,
                    likelihood_wt=1.0, add_reconstruction=True,
                )
                return -jnp.mean(info["elbo"]), ns

            (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), ns, opt_state, rng), loss

        return jax.lax.scan(body, carry, batches)

    batches = jax.device_put(
        jnp.asarray(np.random.default_rng(0).normal(size=(n_steps, batch, dim)), jnp.float32),
        data_sh,
    )
    carry = (
        jax.device_put(variables["params"], repl),
        jax.device_put(variables["state"], repl),
        jax.device_put(opt.init(variables["params"]), repl),
        jax.random.PRNGKey(1),
    )
    with mesh:
        carry, losses = epoch(carry, batches)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        carry, losses = epoch(carry, batches)
        jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    return batch * n_steps / dt


def _collective_share(trace_dir):
    """Share of device self-time in collective ops (all-gather / all-reduce /
    collective-permute) from an xprof hlo_stats pass; None when the backend's
    xplane carries no HLO op stats (some CPU builds)."""
    try:
        from benchmarks.profile_image_step import hlo_breakdown
        import contextlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            summary = hlo_breakdown(trace_dir, top=5)
        total = sum(c["self_time_us"] for c in summary["by_category"].values())
        coll = sum(
            c["self_time_us"]
            for name, c in summary["by_category"].items()
            if any(k in name.lower() for k in ("all-gather", "all-reduce",
                                               "collective", "all-to-all"))
        )
        if total <= 0:
            return None
        return round(coll / total, 4)
    except Exception:
        return None


_HLO_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
              "pred": 1, "s8": 1, "u8": 1}


def _collective_inventory(hlo_text):
    """Static collective accounting from compiled HLO: per-kind op counts and
    output bytes per step. Unlike a time-share, this is exact on ANY backend —
    it reports what GSPMD actually inserted (the all-gather cost curve the
    round-4 verdict asked for), independent of the host mesh's fake
    interconnect. Bytes are per executable run (one scanned epoch)."""
    import re

    inv = {}
    for m in re.finditer(
        r"= (\w+)\[([\d,]*)\][^ ]* (all-gather|all-reduce|reduce-scatter|"
        r"collective-permute|all-to-all)", hlo_text
    ):
        dtype, dims, kind = m.groups()
        n = 1
        for tok in dims.split(","):
            if tok:
                n *= int(tok)
        e = inv.setdefault(kind, {"ops": 0, "bytes_out": 0})
        e["ops"] += 1
        e["bytes_out"] += n * _HLO_BYTES.get(dtype, 4)
    return inv or None


def measure_model_axis(data, model, total_batch=512, d=32, dim=64, n_steps=5,
                       trace_dir=None):
    """Samples/s with the d Jacobian columns sharded over a ``model`` axis.

    Round-4 verdict #5: the (data, model) mesh existed only as a correctness
    dryrun — this measures whether sharding the d-column tangent fan-out
    (SURVEY.md §2.18 "shard the d-column fan-out") actually helps, at a
    geometry where the fan-out dominates: a d=32 flat chain over dim=64
    ambient space (the tangent replay is d x the primal coupler cost).
    Strong scaling: total_batch fixed across mesh shapes."""
    from cmf_tpu.parallel import jacobian_column_partition

    config = expand_grid(get_config("miniboone", "non-square", use_baseline=False))[0]
    config["seed"] = 0
    config.update({
        "latent_dimension": d,
        "num_density_layers": 4,
        "prior_num_density_layers": 2,
        "coupler_hidden_channels": [64] * 2,
        "prior_hidden_channels": [32] * 2,
    })
    density = get_density(get_schema(config), x_shape=(dim,))
    variables = density.init(jax.random.PRNGKey(0))
    opt = optax.adam(config["lr"])

    n_devices = data * model
    mesh = Mesh(np.array(jax.devices()[:n_devices]).reshape(data, model),
                ("data", "model"))
    data_sh = NamedSharding(mesh, P(None, "data"))
    repl = NamedSharding(mesh, P())
    col_spec = NamedSharding(mesh, P("model", "data", None))

    @jax.jit
    def epoch(carry, batches):
        def body(carry, x):
            params, state, opt_state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                info, ns = density.elbo(
                    {"params": p, "state": state}, x, rng=sub, train=True,
                    likelihood_wt=1.0, add_reconstruction=True,
                )
                return -jnp.mean(info["elbo"]), ns

            (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return (optax.apply_updates(params, updates), ns, opt_state, rng), loss

        return jax.lax.scan(body, carry, batches)

    batches = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).normal(size=(n_steps, total_batch, dim)),
            jnp.float32,
        ),
        data_sh,
    )
    carry = (
        jax.device_put(variables["params"], repl),
        jax.device_put(variables["state"], repl),
        jax.device_put(opt.init(variables["params"]), repl),
        jax.random.PRNGKey(1),
    )
    with mesh, jacobian_column_partition(col_spec if model > 1 else None):
        compiled = epoch.lower(carry, batches).compile()
        inventory = _collective_inventory(compiled.as_text())
        carry, losses = epoch(carry, batches)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        carry, losses = epoch(carry, batches)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        share = None
        if trace_dir:
            import os

            os.makedirs(trace_dir, exist_ok=True)
            with jax.profiler.trace(trace_dir):
                carry, losses = epoch(carry, batches)
                jax.block_until_ready(losses)
            share = _collective_share(trace_dir)
    return total_batch * n_steps / dt, share, inventory


def model_axis_sweep(out_path=None, shapes=((8, 1), (4, 2), (2, 4)),
                     total_batch=512, d=32):
    import os
    import tempfile

    rows = []
    for data, model in shapes:
        if data * model > jax.device_count():
            continue
        trace_dir = tempfile.mkdtemp(prefix=f"scal_m{model}_")
        sps, share, inventory = measure_model_axis(
            data, model, total_batch=total_batch, d=d, trace_dir=trace_dir
        )
        row = {
            "mesh": [data, model],
            "samples_per_s": round(sps, 1),
            "collective_share": share,
            "collectives_per_epoch": inventory,
        }
        rows.append(row)
        print(json.dumps(row))
    base = rows[0]["samples_per_s"] if rows else None
    for row in rows:
        row["vs_pure_data_parallel"] = round(row["samples_per_s"] / base, 3) if base else None
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "platform": jax.devices()[0].platform,
                    "device_kind": jax.devices()[0].device_kind,
                    "geometry": {"d": d, "dim": 64, "total_batch": total_batch,
                                 "layers": 4, "coupler_hidden": [64, 64]},
                    "note": (
                        "CPU host-device mesh (no real interconnect, 2 physical "
                        "cores): ranks mesh SHAPES against each other under "
                        "GSPMD's actual partitioning/collectives, but absolute "
                        "numbers and the collective-share are not ICI "
                        "measurements — only one real TPU chip is reachable "
                        "in this container."
                        if jax.devices()[0].platform == "cpu"
                        else "real-device measurement"
                    ),
                    "rows": rows,
                },
                f,
                indent=2,
            )
    return rows


def main(out_path=None):
    n_avail = jax.device_count()
    on_cpu = jax.devices()[0].platform == "cpu"
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    rows = []
    base = None
    for n in sizes:
        if on_cpu:  # machinery validation, not a hardware measurement
            sps = measure(n, per_device_batch=128, n_steps=5, depth=2)
        else:
            sps = measure(n)
        if base is None:
            base = sps
        row = {
            "devices": n,
            "samples_per_s": round(sps, 1),
            "scaling_efficiency": round(sps / (base * n), 3),
        }
        rows.append(row)
        print(json.dumps(row))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "platform": jax.devices()[0].platform,
                    "device_kind": jax.devices()[0].device_kind,
                    "note": (
                        "CPU host-device mesh: validates the sharded train-step "
                        "machinery (GSPMD psum over the data axis), not ICI "
                        "bandwidth — only one real TPU chip is reachable in "
                        "this container (BASELINE north-star is >=80% at N "
                        "real chips)."
                        if on_cpu
                        else "real-device measurement"
                    ),
                    "rows": rows,
                },
                f,
                indent=2,
            )
    return rows


if __name__ == "__main__":
    import sys

    if "--model-axis" in sys.argv:
        i = sys.argv.index("--model-axis")
        out = sys.argv[i + 1] if len(sys.argv) > i + 1 else None
        model_axis_sweep(out_path=out)
    else:
        main(out_path=sys.argv[1] if len(sys.argv) > 1 else None)
