#!/usr/bin/env python3
"""Fused coupler kernel vs XLA ResNet at the image-chain geometries.

Times the forward coupler (the unit the multiscale image decode repeats
~10×) both ways, scanned inside one jit per CLAUDE.md microbenchmark rules
(python-loop timing over the tunnel measures dispatch, not device time).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/coupler_kernel_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cmf_tpu.nets import ResNet
from cmf_tpu.ops.pallas.coupler_stack import fused_resnet_coupler


def bench(c_in, c_out, hw, blocks, hidden, batch, n_iters=50):
    net = ResNet(c_in, [hidden] * blocks, c_out, use_batchnorm=False)
    variables = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, c_in, hw, hw))

    def scanned(fn):
        @jax.jit
        def run(x0):
            def body(x, _):
                out = fn(x)
                # feed a c_in-shaped signal back so the scan can't hoist
                x_next = x0 + 1e-6 * jnp.mean(out) * jnp.ones_like(x0)
                return x_next, jnp.sum(out)
            _, outs = jax.lax.scan(body, x0, None, length=n_iters)
            return outs

        run(x).block_until_ready()  # compile + warmup
        t0 = time.perf_counter()
        out = run(x)
        out.block_until_ready()
        return (time.perf_counter() - t0) / n_iters * 1e3

    results = {"xla_ms": scanned(lambda x: net.apply(variables, x, train=False)[0])}
    for label, kw in (
        ("fused_fp32", {}),
        ("fused_bf16", {"bf16": True}),
        ("fused_bf16_stacked", {"bf16": True, "stack_taps": True}),
    ):
        results[label + "_ms"] = scanned(
            lambda x, kw=kw: fused_resnet_coupler(
                x, variables["params"], num_blocks=blocks, **kw
            )
        )
    return results


def main():
    rows = []
    for c_in, c_out, hw, blocks, hidden, batch in (
        (1, 2, 28, 8, 64, 50),   # mnist scale-1 checkerboard coupler
        (1, 2, 28, 8, 64, 250),  # same at the FID-generation batch
        (2, 4, 14, 8, 64, 50),   # post-squeeze split-channel coupler
        (2, 4, 14, 8, 64, 500),  # d-column fan-out effective batch
    ):
        r = bench(c_in, c_out, hw, blocks, hidden, batch)
        row = {"geometry": f"{c_in}->{c_out} @{hw}x{hw} b{batch} {blocks}blk{hidden}ch",
               **{k: round(v, 3) for k, v in r.items()}}
        row["best_speedup"] = round(
            r["xla_ms"] / min(v for k, v in r.items() if k != "xla_ms"), 2
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
