#!/usr/bin/env python3
"""Benchmark suite: the BASELINE.json measurement battery.

Measures, on the available accelerator:
  * miniboone non-square train throughput (the bench.py headline)
  * JᵀJ log-det evaluations/s (exact Cholesky path, forward only)
  * sampling throughput (the FID-generation path)
  * data-parallel scaling over available local devices
  * optional bf16-coupler variant

Prints one JSON object per benchmark, plus a summary line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cmf_tpu.config import expand_grid, get_config, get_schema
from cmf_tpu.models import get_density
from cmf_tpu.nets import compute_dtype


def build(dataset="miniboone", dim=43, **overrides):
    config = expand_grid(get_config(dataset, "non-square", use_baseline=False))[0]
    config["seed"] = 0
    config.update(overrides)
    density = get_density(get_schema(config), x_shape=(dim,))
    variables = density.init(jax.random.PRNGKey(0))
    return config, density, variables


def scan_timer(fn, carry, xs, n_warmup=1):
    out = fn(carry, xs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(carry, xs)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def bench_train(config, density, variables, batch=400, dim=43, n_steps=30):
    opt = optax.adam(config["lr"])

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

    batches = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_steps, batch, dim)), jnp.float32
    )
    carry = (variables["params"], variables["state"], opt.init(variables["params"]),
             jax.random.PRNGKey(1))
    dt = scan_timer(epoch, carry, batches)
    return batch * n_steps / dt


def bench_logdet(config, density, variables, batch=400, dim=43, n_iters=50):
    """Forward-only exact JᵀJ log-det evaluations/s (the paper's hot kernel)."""

    @jax.jit
    def run(x0, _):
        def body(x, _):
            info, _ = density.elbo(variables, x, train=False)
            # feed back to serialize iterations
            return x + 1e-12 * info["elbo"][:, None], info["elbo"][0]

        return jax.lax.scan(body, x0, None, length=n_iters)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, dim)), jnp.float32)
    dt = scan_timer(run, x, None)
    return batch * n_iters / dt


def bench_sampling(config, density, variables, n_samples=10000, batch=500):
    @jax.jit
    def sample_many(rng):
        def body(rng, _):
            rng, sub = jax.random.split(rng)
            return rng, density.sample(variables, sub, batch)

        _, samples = jax.lax.scan(body, rng, None, length=n_samples // batch)
        return samples

    out = sample_many(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = sample_many(jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    return n_samples / (time.perf_counter() - t0)


def main():
    results = {}
    config, density, variables = build()

    results["train_samples_per_s"] = bench_train(config, density, variables)
    results["logdet_evals_per_s"] = bench_logdet(config, density, variables)
    results["sampling_samples_per_s"] = bench_sampling(config, density, variables)

    # Image-chain sampling (the FID-generation decode) at the REAL mnist
    # geometry (28×28 — an earlier cell here accidentally measured the toy
    # 8×8 graft geometry). Fused-kernel cells were measured in round 4 and
    # removed: fused-MLP 280.2k vs 276.4k samples/s (+1.3%, noise) on the
    # flat chain; the fused ResNet coupler loses at FID batch sizes — see
    # benchmarks/coupler_kernel_bench.py for the geometry-resolved A/B.
    import __graft_entry__ as ge

    img_cfg, img_density, img_vars = ge._build_image(
        {"g_hidden_channels": [64] * 4, "latent_dimension": 10},
        x_shape=(1, 28, 28),
    )
    results["image_sampling_samples_per_s"] = bench_sampling(
        img_cfg, img_density, img_vars, n_samples=5000, batch=250
    )

    with compute_dtype("bfloat16"):
        config2, density2, variables2 = build()
        results["train_samples_per_s_bf16"] = bench_train(config2, density2, variables2)

    n_dev = jax.device_count()
    results["num_devices"] = n_dev
    results["device_kind"] = jax.devices()[0].device_kind

    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v, 2) if isinstance(v, float) else v}))
    return results


if __name__ == "__main__":
    main()
