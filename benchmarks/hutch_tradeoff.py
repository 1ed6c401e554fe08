"""Hutchinson solver / probe-count / CG-iteration tradeoff on the image path.

ROADMAP item ("Optimal Stochastic Trace Estimation", PAPERS.md): with the
iterative "cg" solver the mnist non-square step is dominated by the sequential
CG solve — each iteration is a JVP+VJP pass through the linearized multiscale
decode at batch B, while S probes ride the SAME pass vmapped (effective conv
batch B·S). The "gram" solver (the default) replaces the whole iteration with
one detached batched tangent fan-out (effective batch B·d) + an exact d×d
Cholesky solve, so its cost is independent of S and iteration count.

This script measures, per (solver, S, max_cg_iterations) cell:

  * ms/step of the full train step (fwd+bwd+adam),
  * surrogate-value drift |E[surrogate] − exact| and the std of the surrogate
    across probe draws. NOTE the cg surrogate's *value* is by construction
    ≈ εᵀε, not a log-det estimate — only its gradient is meaningful — so the
    drift column measures value drift, not estimator bias. The gram solver's
    value correction makes its drift ≈ 0 by construction. The exact reference
    is computed train=True through the cholesky path on the SAME parameters,
    so batch-norm statistics match (batch stats, not running stats).

Usage:  python benchmarks/hutch_tradeoff.py [dataset]
Prints one JSON line per cell.
"""

import json
import os
import sys
import time

import numpy as np


def main(dataset="mnist"):
    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.expanduser("~/.cache/cmf_tpu_xla"), jax.default_backend())
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cmf_tpu.config import expand_grid, get_config, get_schema
    from cmf_tpu.models import get_density

    base = get_config(dataset, "non-square", use_baseline=False)
    base = expand_grid(base)[0]
    base["seed"] = 0
    batch = base["train_batch_size"]
    x_shape = (1, 28, 28) if dataset in ("mnist", "fashion-mnist") else (3, 32, 32)
    rng = np.random.default_rng(0)
    N = 5
    batches = jnp.asarray(rng.uniform(0, 255, size=(N, batch, *x_shape)), jnp.float32)

    def build(solver, S, max_iter):
        cfg = dict(base)
        cfg["hutchinson_solver"] = solver
        cfg["hutchinson_samples"] = S
        cfg["max_cg_iterations"] = max_iter
        density = get_density(get_schema(cfg), x_shape=x_shape)
        variables = density.init(jax.random.PRNGKey(0))
        return cfg, density, variables

    def step_ms(cfg, density, variables):
        opt = optax.adam(cfg["lr"])
        opt_state = opt.init(variables["params"])

        def body(carry, x):
            params, state, opt_state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(p):
                info, ns = density.elbo(
                    {"params": p, "state": state}, x, rng=sub, train=True,
                    likelihood_wt=1.0, add_reconstruction=True,
                )
                return -jnp.mean(info["elbo"]), ns

            (_, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state, key), 0.0

        @jax.jit
        def run(carry, xs):
            return jax.lax.scan(body, carry, xs)

        init = (variables["params"], variables["state"], opt_state, jax.random.PRNGKey(1))
        carry, out = run(init, batches)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        carry, out = run(init, batches)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / N * 1e3

    def estimator_stats(cfg, density, variables, draws=8):
        """Surrogate elbo mean/std across probe draws vs the exact train-mode
        value (cholesky path, same params → identical batch-norm stats)."""
        x = batches[0]

        cfg_exact = dict(cfg)
        cfg_exact["log_jacobian_method"] = "cholesky"
        density_exact = get_density(get_schema(cfg_exact), x_shape=x_shape)

        @jax.jit
        def surrogate(key):
            info, _ = density.elbo(
                variables, x, rng=key, train=True,
                likelihood_wt=1.0, add_reconstruction=False,
            )
            return jnp.mean(info["elbo"])

        @jax.jit
        def exact():
            info, _ = density_exact.elbo(
                variables, x, rng=jax.random.PRNGKey(0), train=True,
                likelihood_wt=1.0, add_reconstruction=False,
            )
            return jnp.mean(info["elbo"])

        vals = np.array([float(surrogate(jax.random.PRNGKey(i))) for i in range(draws)])
        return float(np.mean(vals)), float(np.std(vals)), float(exact())

    cells = [
        ("gram", 1, 20, "fp32"),   # exact-Gram via the dense conv fan-out program
        ("cg", 1, 20, "fp32"),     # the reference image default (cg_tolerance=1)
        ("cg", 1, 10, "fp32"),
        ("cg", 4, 10, "fp32"),
        ("cg", 4, 5, "fp32"),
        # bf16 coupler convs (fp32 Gram/Cholesky/CG stay pinned): measures the
        # MXU fast path on the SAME workload. Within-row drift stays an
        # estimator property (exact is recomputed under the same dtype); the
        # bf16 numerics shift is this row's exact_train_elbo vs the fp32 rows'
        # (identical params across cells — init is dtype-policy independent).
        ("cg", 1, 20, "bf16"),
    ]
    from cmf_tpu.nets import compute_dtype

    rows = []
    for solver, S, max_iter, dtype in cells:
        # NOTE: _COMPUTE_DTYPE is read at TRACE time, so `build`/`step_ms`/
        # `estimator_stats` must construct fresh jit closures per cell (they
        # do). Hoisting any of those jits to module level would silently reuse
        # the fp32-compiled cache for the bf16 row.
        with compute_dtype("bfloat16" if dtype == "bf16" else "float32"):
            cfg, density, variables = build(solver, S, max_iter)
            ms = step_ms(cfg, density, variables)
            mean, std, exact_val = estimator_stats(cfg, density, variables)
        row = {
            "solver": solver,
            "compute_dtype": dtype,
            "hutchinson_samples": S,
            "max_cg_iterations": max_iter,
            "ms_per_step": round(ms, 2),
            "samples_per_s": round(batch / ms * 1e3, 1),
            "surrogate_mean": round(mean, 4),
            "surrogate_std": round(std, 4),
            "exact_train_elbo": round(exact_val, 4),
            "surrogate_value_drift": round(abs(mean - exact_val), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = os.environ.get("HUTCH_TRADEOFF_OUT")
    if out:
        import jax as _jax

        with open(out, "w") as f:
            json.dump(
                {"dataset": dataset, "device_kind": _jax.devices()[0].device_kind,
                 "rows": rows},
                f, indent=2,
            )


if __name__ == "__main__":
    main(*sys.argv[1:])
