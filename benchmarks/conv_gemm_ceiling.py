#!/usr/bin/env python3
"""Is XLA's image conv already at matmul rate? (the ceiling check)

PROFILE_image_r4.json shows the mnist step's 64-ch 28×28 convs running at
~39 TFLOP/s effective bf16. A 3×3/64-ch conv over (B=50, 28, 28) is the
implicit GEMM (M=64, K=576, N=50·784=39200). This script times that exact
GEMM as a plain bf16 matmul, plus the M=128 and M=256 variants that show
the M-bound MXU ceiling, and the conv itself — if conv ≈ gemm(M=64), XLA's
conv is matmul-rate and the only remaining headroom is the architecture's
own M=64 output-channel count, not the implementation.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/conv_gemm_ceiling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, x, *rest, iters=100):
    """Scan-timed with the output folded back into fn's FIRST operand — a
    loop-carried dependency, so XLA cannot hoist the op out of the while
    body (it does for dependency-free bodies: ~100× fake speedup)."""

    @jax.jit
    def run(x0, *r):
        def body(x_cur, _):
            out = fn(x_cur, *r)
            x_next = x0 + (1e-20 * jnp.sum(out)).astype(x0.dtype)
            return x_next, None

        x_last, _ = jax.lax.scan(body, x0, None, length=iters)
        return x_last

    run(x, *rest).block_until_ready()
    t0 = time.perf_counter()
    run(x, *rest).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    n = 50 * 28 * 28
    rows = []

    # the conv itself (bf16 operands, f32 accumulate — XLA's auto-bf16 form)
    x = jax.random.normal(key, (50, 64, 28, 28), jnp.bfloat16)
    w = jax.random.normal(key, (64, 64, 3, 3), jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )

    t = timed(conv, x, w)
    flops = 2 * 64 * 64 * 9 * n
    rows.append({"case": "conv 64ch 3x3 @28x28 b50 bf16", "us": round(t * 1e6, 1),
                 "tflops": round(flops / t / 1e12, 1)})

    # the implicit GEMM at M = 64 / 128 / 256 (same K, N)
    for m in (64, 128, 256):
        a = jax.random.normal(key, (m, 576), jnp.bfloat16)
        b = jax.random.normal(key, (576, n), jnp.bfloat16)

        def gemm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        t = timed(gemm, a, b)
        flops = 2 * m * 576 * n
        rows.append({"case": f"gemm M={m} K=576 N={n} bf16",
                     "us": round(t * 1e6, 1),
                     "tflops": round(flops / t / 1e12, 1)})

    for r in rows:
        print(json.dumps(r), flush=True)
    return rows


if __name__ == "__main__":
    main()
