"""Fused MLP coupler kernel (Pallas/TPU).

The coupler MLPs of the flat-realnvp models are chains of small matmuls
(22→128→…→44 at a few-thousand-row batch). Issued as separate XLA ops each
hidden layer round-trips its activations through HBM and pays per-op
overhead — profiling on v5e showed the chain is latency-bound, not
FLOP-bound (SURVEY.md §3.2 hot path). This kernel runs the whole chain in
one ``pallas_call``: weights live in VMEM for every row tile, intermediates
never leave VMEM, the MXU sees back-to-back matmuls.

Wired behind the ``nets.fused_inference()`` trace-time context: inside it,
``nets.core.MLP.apply`` routes whole dense chains through this kernel on
no-gradient paths (sampling / FID generation; the kernel has no VJP rule).
Parity: tests/test_ops.py::test_fused_mlp_matches_mlp_apply (direct, routed,
and full non-square sampling). Measured A/B:
``sampling_samples_per_s_fused_mlp`` in benchmarks/run_all.py. Training
keeps the XLA path (fully differentiable, which ``jax.linearize`` requires).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _env_interpret():
    return os.environ.get("CMF_TPU_PALLAS_INTERPRET", "") == "1"


def fused_mlp_available():
    if not _PALLAS_OK:
        return False
    platform = jax.devices()[0].platform
    return platform == "tpu" or (platform == "cpu" and _env_interpret())


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(x_ref, *refs, activation, num_layers):
    # refs: w_0, b_0, ..., w_{L-1}, b_{L-1}, out_ref
    out_ref = refs[-1]
    h = x_ref[:]
    for i in range(num_layers):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[0]
        if i < num_layers - 1:
            h = activation(h)
    out_ref[:] = h


@functools.partial(
    jax.jit, static_argnames=("activation_name", "tile_rows", "interpret")
)
def fused_mlp(x, weights, biases, activation_name="tanh", tile_rows=1024,
              interpret=False):
    """y = MLP(x) with all layers fused into one kernel.

    x: (N, n_in); weights: list of (n_i, n_{i+1}); biases: list of (n_{i+1},).
    Activation between layers only (matching nets.core.MLP semantics).
    Forward-only (no VJP rule) — inference paths only.
    """
    activation = {"tanh": jnp.tanh, "relu": jax.nn.relu}[activation_name]
    num_layers = len(weights)
    n, n_in = x.shape
    n_out = weights[-1].shape[1]

    # Pad feature dims to the 128-lane register width and rows to the tile.
    pad_in = _round_up(n_in, 128)
    n_pad = _round_up(n, tile_rows)
    x_p = jnp.zeros((n_pad, pad_in), x.dtype).at[:n, :n_in].set(x)

    ws, bs = [], []
    prev = pad_in
    for w, b in zip(weights, biases):
        o_pad = _round_up(w.shape[1], 128)
        w_p = jnp.zeros((prev, o_pad), w.dtype).at[: w.shape[0], : w.shape[1]].set(w)
        b_p = jnp.zeros((1, o_pad), b.dtype).at[0, : b.shape[0]].set(b)
        ws.append(w_p)
        bs.append(b_p)
        prev = o_pad

    grid = (n_pad // tile_rows,)
    in_specs = [
        pl.BlockSpec((tile_rows, pad_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    operands = [x_p]
    for w_p, b_p in zip(ws, bs):
        in_specs.append(pl.BlockSpec(w_p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b_p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        operands += [w_p, b_p]

    out = pl.pallas_call(
        functools.partial(_kernel, activation=activation, num_layers=num_layers),
        out_shape=jax.ShapeDtypeStruct((n_pad, prev), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_rows, prev), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
    return out[:n, :n_out]


def mlp_params_to_arrays(mlp_params):
    """Extract (weights, biases) lists from a nets.core.MLP param pytree."""
    layers = mlp_params["layers"]
    return [l["w"] for l in layers], [l["b"] for l in layers]
