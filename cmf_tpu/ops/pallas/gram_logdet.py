"""Fused JᵀJ Gram + Cholesky + log-det kernel (Pallas/TPU).

The exact non-square log-det path (reference non_square.py:262-311) needs, per
batch element, G = JᵀJ (d×d from the D×d Jacobian columns) and
log|G| = 2Σ log diag chol(G). Issued as XLA ops this is a batched-matmul that
loops the MXU once per (tiny) batch element plus a Cholesky HLO that is
pathologically slow for small batched matrices — together ~0.9 ms for
(B=400, d=21, D=43) on v5e, dominating the train step.

This kernel restructures the computation for the VPU instead: the batch lives
on the 128-lane axis, so every Gram entry G[i,j] is one multiply+reduce over
the D sublanes of two (D, 128) tiles, and the unrolled column Cholesky runs
arithmetic on (1, 128) lanes — 128 batch elements factorized in lock-step per
grid step. Gram, factor and log-det never leave VMEM.

The backward pass is a second kernel implementing
    dJ[i] = Σ_j (Ḡ[i,j] + Ḡ[j,i] + 2·ḡ_ld·G⁻¹[i,j]) · J[j]
with G⁻¹ rebuilt from the saved factor L by unrolled forward substitution
(L⁻¹, then G⁻¹ = L⁻ᵀL⁻¹) in the same lane-vectorized layout.

Numerics: everything is fp32 on the VPU — bit-comparable to the fp32-HIGHEST
XLA path (CLAUDE.md Gram/Cholesky policy). Non-PD inputs produce NaN in the
affected lanes exactly like the XLA path, so the caller's jitter-retry
fallback (ops/chol.py) still triggers.
"""

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_LANES = 128
# Unrolled-kernel size gate: VMEM block (d·D_pad·128·4B) and compile-time op
# count (≈d³/6 vector instructions) both stay comfortable under these bounds.
_MAX_D_LATENT = 32
_MAX_D_AMBIENT = 128


# Incremented each time the sharded wrapper is traced — lets the multichip
# dryrun assert the exact path actually went through the kernel rather than
# silently taking the XLA fallback.
SHARDED_TRACE_COUNT = [0]


def _env_interpret():
    """CMF_TPU_PALLAS_INTERPRET=1 runs the kernel in Pallas interpret mode so
    non-TPU backends (the 8-device CPU dryrun mesh, CI) execute the REAL
    kernel path end-to-end instead of silently falling back to XLA."""
    return os.environ.get("CMF_TPU_PALLAS_INTERPRET", "") == "1"


def fused_gram_logdet_available(d, big_d, platform=None):
    if not _PALLAS_OK:
        return False
    if d > _MAX_D_LATENT or big_d > _MAX_D_AMBIENT:
        return False
    platform = platform or jax.devices()[0].platform
    return platform == "tpu" or (platform == "cpu" and _env_interpret())


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------- fwd
def _fwd_kernel(jac_ref, gram_ref, logdet_ref, l_ref, *, d):
    """jac_ref: (d, D, 128). Outputs: gram/l (d, d, 128), logdet (1, 128)."""
    J = [jac_ref[i] for i in range(d)]  # each (D, 128)

    # Gram: G[i][j] = Σ_D J_i ⊙ J_j, lower triangle (symmetric).
    G = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            G[i][j] = jnp.sum(J[i] * J[j], axis=0, keepdims=True)  # (1, 128)

    # Unrolled column Cholesky (Cholesky–Banachiewicz) on lanes.
    L = [[None] * d for _ in range(d)]
    logdet = jnp.zeros((1, _LANES), jnp.float32)
    for j in range(d):
        s = G[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        logdet = logdet + jnp.log(s)
        inv = jax.lax.rsqrt(s)
        L[j][j] = s * inv  # sqrt(s)
        for i in range(j + 1, d):
            t = G[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv

    logdet_ref[:] = logdet  # already 2·Σ log diag L, since Σ log s = 2Σ log √s
    for i in range(d):
        for j in range(d):
            gram_ref[i, j, :] = G[max(i, j)][min(i, j)][0]
            l_ref[i, j, :] = L[i][j][0] if j <= i else jnp.zeros((_LANES,), jnp.float32)


# --------------------------------------------------------------------- bwd
def _bwd_kernel(jac_ref, l_ref, gbar_ref, ldbar_ref, djac_ref, *, d):
    """dJ[i] = Σ_j (Ḡ[i,j] + Ḡ[j,i] + 2·ḡ_ld·G⁻¹[i,j]) · J[j]."""
    L = [[l_ref[i, j, :][None] for j in range(i + 1)] for i in range(d)]

    # X = L⁻¹ by unrolled forward substitution (lower triangular).
    X = [[None] * d for _ in range(d)]
    for i in range(d):
        inv = pl.reciprocal(L[i][i], approx=False)
        for j in range(i):
            t = jnp.zeros((1, _LANES), jnp.float32)
            for k in range(j, i):
                t = t - L[i][k] * X[k][j]
            X[i][j] = t * inv
        X[i][i] = inv

    # G⁻¹ = XᵀX: Ginv[i][j] = Σ_{k≥max(i,j)} X[k][i]·X[k][j] (symmetric).
    Ginv = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            t = jnp.zeros((1, _LANES), jnp.float32)
            for k in range(i, d):
                t = t + X[k][i] * X[k][j]
            Ginv[i][j] = t

    ldbar2 = 2.0 * ldbar_ref[:]  # (1, 128)
    J = [jac_ref[j] for j in range(d)]  # (D, 128)
    for i in range(d):
        m0 = (
            gbar_ref[i, 0, :][None]
            + gbar_ref[0, i, :][None]
            + ldbar2 * Ginv[max(i, 0)][min(i, 0)]
        )
        acc = m0 * J[0]
        for j in range(1, d):
            m = (
                gbar_ref[i, j, :][None]
                + gbar_ref[j, i, :][None]
                + ldbar2 * Ginv[max(i, j)][min(i, j)]
            )
            acc = acc + m * J[j]
        djac_ref[i] = acc


# ---------------------------------------------------------------- wrappers
@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(jac_t, interpret=False):
    """jac_t: (d, D, B_pad) → (gram (d,d,B_pad), logdet (1,B_pad), L)."""
    d, big_d, b_pad = jac_t.shape
    grid = (b_pad // _LANES,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, big_d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, d, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((d, d, b_pad), jnp.float32),
        ],
        interpret=interpret,
    )(jac_t)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(jac_t, l_t, gbar_t, ldbar, interpret=False):
    d, big_d, b_pad = jac_t.shape
    grid = (b_pad // _LANES,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, big_d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (d, big_d, _LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, big_d, b_pad), jnp.float32),
        interpret=interpret,
    )(jac_t, l_t, gbar_t, ldbar)


def fused_gram_logdet(jac_cols, interpret=None):
    """(d, B, D) Jacobian columns → (gram (B,d,d), logdet (B,)).

    Identical semantics to ``gram_from_columns`` + a single (un-jittered)
    Cholesky log-det; NaN where the Gram is not PD. Callers keep the jitter
    fallback on the XLA path (densities/nonsquare.py). ``interpret=None``
    resolves to compiled on TPU, interpret mode elsewhere."""
    if interpret is None:
        interpret = _env_interpret() or jax.devices()[0].platform != "tpu"
    return _fused_gram_logdet(jac_cols, bool(interpret))


def fused_gram_logdet_sharded(jac_cols, sharding, interpret=None):
    """`fused_gram_logdet` under an active Jacobian-column partition.

    ``jac_cols`` is the global (d, B, D) array laid out by ``sharding`` (a
    ``NamedSharding``, canonically ``P("model", "data", None)`` from
    parallel/mesh.py). A bare ``pallas_call`` has no GSPMD partitioning rule,
    so without this wrapper GSPMD would all-gather everything onto every
    device and the multi-chip exact path lost the kernel
    (round-3 verdict item 3). Inside ``shard_map``:

      * each device all-gathers the COLUMN shards over the model axis
        (exactly the collective the XLA gram einsum needs anyway — G pairs
        every column with every other), keeping its batch shard local;
      * the fused kernel then runs per-device on (d, B/n_data, D);
      * outputs are batch-sharded over "data" and replicated over "model"
        (each model rank computes the identical Gram for its batch rows —
        redundant arithmetic on a ~μs kernel, in exchange for keeping the
        d-column decode fan-out sharded where the real FLOPs are).

    Gradients flow through ``jax.lax.all_gather`` (transpose:
    ``psum_scatter``), so each device's dJ columns return to their owner.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = _env_interpret() or jax.devices()[0].platform != "tpu"
    interpret = bool(interpret)
    SHARDED_TRACE_COUNT[0] += 1  # diagnostics: proves the branch was traced

    spec = tuple(sharding.spec) + (None,) * (3 - len(sharding.spec))
    col_axis, batch_axis = spec[0], spec[1]

    def local(jac_local):
        if col_axis is not None:
            jac_local = jax.lax.all_gather(jac_local, col_axis, axis=0, tiled=True)
        return _fused_gram_logdet(jac_local, interpret)

    return shard_map(
        local,
        mesh=sharding.mesh,
        in_specs=(P(*spec),),
        out_specs=(P(batch_axis, None, None), P(batch_axis)),
        check_rep=False,
    )(jac_cols)


def fused_gram_logdet_sharded_available(d, batch, big_d, sharding):
    """Static (trace-time) gate for the shard_map path: kernel size limits
    plus even divisibility of the column and batch axes over the mesh."""
    spec = tuple(sharding.spec) + (None,) * (3 - len(sharding.spec))
    if spec[2] is not None:  # ambient axis must stay unsharded
        return False
    mesh = sharding.mesh
    col_n = mesh.shape[spec[0]] if spec[0] is not None else 1
    batch_n = mesh.shape[spec[1]] if spec[1] is not None else 1
    if d % col_n or batch % batch_n:
        return False
    return fused_gram_logdet_available(d, big_d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fused_gram_logdet(jac_cols, interpret):
    gram, logdet, _ = _fused_fwd_impl(jac_cols, interpret)
    return gram, logdet


def _fused_fwd_impl(jac_cols, interpret):
    d, b, big_d = jac_cols.shape
    b_pad = _round_up(b, _LANES)
    jac_t = jnp.zeros((d, big_d, b_pad), jnp.float32).at[:, :, :b].set(
        jnp.swapaxes(jac_cols.astype(jnp.float32), 1, 2)
    )
    gram_t, logdet_t, l_t = _fwd_call(jac_t, interpret=interpret)
    gram = jnp.moveaxis(gram_t[:, :, :b], -1, 0)  # (B, d, d)
    logdet = logdet_t[0, :b]
    return gram, logdet, (jac_t, l_t)


def _fused_fwd(jac_cols, interpret):
    gram, logdet, res = _fused_fwd_impl(jac_cols, interpret)
    return (gram, logdet), res


def _fused_bwd(interpret, res, cotangents):
    jac_t, l_t = res
    gbar, ldbar = cotangents  # (B, d, d), (B,)
    d, big_d, b_pad = jac_t.shape
    b = gbar.shape[0]
    gbar_t = jnp.zeros((d, d, b_pad), jnp.float32).at[:, :, :b].set(
        jnp.moveaxis(gbar.astype(jnp.float32), 0, -1)
    )
    ldbar_t = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(ldbar.astype(jnp.float32))
    djac_t = _bwd_call(jac_t, l_t, gbar_t, ldbar_t, interpret=interpret)
    djac = jnp.swapaxes(djac_t[:, :, :b], 1, 2)  # (d, B, D)
    return (djac,)


_fused_gram_logdet.defvjp(_fused_fwd, _fused_bwd)
