#!/usr/bin/env python3
"""Benchmark: non-square CMF training throughput (samples/s/chip).

Runs the miniboone-shaped non-square config (latent_dimension=21, exact
Cholesky JᵀJ log-det — the hot path of SURVEY.md §3.2) on the available
accelerator with synthetic data, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md) — vs_baseline
compares against a stored first-measurement anchor when present.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import os as _os

    import jax

    cache = _os.path.join(_os.path.expanduser("~/.cache/cmf_tpu_xla"), jax.default_backend())
    _os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from cmf_tpu.config import expand_grid, get_config, get_schema
    from cmf_tpu.models import get_density

    config = get_config("miniboone", "non-square", use_baseline=False)
    config = expand_grid(config)[0]
    config["seed"] = 0
    # Full miniboone non-square geometry (tabular.py:280-354): D=43, d=21,
    # batch 400, 10 coupling layers + 5-layer realnvp prior, cholesky.
    batch = config["train_batch_size"] = 400
    dim = 43

    density = get_density(get_schema(config), x_shape=(dim,))
    variables = density.init(jax.random.PRNGKey(0))
    opt = optax.adam(config["lr"])
    opt_state = opt.init(variables["params"])

    @jax.jit
    def train_epoch(params, state, opt_state, rng, batches):
        """Whole-epoch lax.scan — one dispatch per epoch, PRNG carried on
        device (mirrors Trainer._get_epoch_fn)."""

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

        carry, losses = jax.lax.scan(body, (params, state, opt_state, rng), batches)
        return carry, losses

    host_rng = np.random.default_rng(0)
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    batches = jnp.asarray(host_rng.normal(size=(n_steps, batch, dim)), jnp.float32)
    params, state = variables["params"], variables["state"]
    key = jax.random.PRNGKey(1)

    # Warmup / compile
    carry, losses = train_epoch(params, state, opt_state, key, batches)
    jax.block_until_ready(losses)
    params, state, opt_state, key = carry

    t0 = time.perf_counter()
    carry, losses = train_epoch(params, state, opt_state, key, batches)
    jax.block_until_ready(losses)
    elapsed = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(losses)))

    n_chips = jax.device_count()
    samples_per_s_per_chip = batch * n_steps / elapsed / n_chips

    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_anchor.json")
    vs_baseline = None
    try:
        with open(anchor_path) as f:
            anchor = json.load(f)
        if anchor.get("device_kind") == jax.devices()[0].device_kind:
            vs_baseline = samples_per_s_per_chip / anchor["value"]
    except FileNotFoundError:
        pass

    print(
        json.dumps(
            {
                "metric": "miniboone non-square train throughput (cholesky logdet d=21, batch 400)",
                "value": round(samples_per_s_per_chip, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            }
        )
    )
    return samples_per_s_per_chip


if __name__ == "__main__":
    main()
