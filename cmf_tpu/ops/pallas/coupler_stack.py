"""Fused ResNet-coupler kernel (Pallas/TPU) — the image ACL hot path.

The multiscale image chains (ref acl.py:29-78 + networks.py:116-161) run a
17-conv ResNet coupler per coupling layer at small spatial dims (28×28 /
14×14). Issued as XLA ops, every conv round-trips its feature map through
HBM and the small-channel convs tile the MXU poorly. This kernel runs the
ENTIRE coupler — conv_in, K residual blocks (relu→conv3x3 twice + skip,
batchnorm-free: the non-square image config sets resnet_batchnorm=False),
final relu → 1×1 conv → scaled-tanh head — in one ``pallas_call``:

  * feature maps live as (C, B_chunk·P_pad) tiles: channels on sublanes,
    flattened pixels on lanes, images padded to a 128-multiple lane block;
  * each 3×3 conv is the shift-matmul decomposition
    out = Σ_{dy,dx} W[dy,dx] @ roll(h, −(dy·W+dx)) with per-tap validity
    masks derived from the out-pixel coordinates (row-crossing and
    image-boundary wraps contribute zero), so intermediates NEVER leave
    VMEM across the 17 layers;
  * the MXU sees back-to-back (64×64)·(64, L) matmuls with L = chunk lanes.

Forward-only (no VJP rule). STATUS (round 4): this kernel is committed
DECISION EVIDENCE for the image-megakernel verdict, not a production path.
Measured on v5e (benchmarks/coupler_kernel_bench.py): 1.67×/1.47× over a
standalone XLA coupler forward at batch 50 (28×28/14×14), but 0.61× at the
batch-500 fan-out geometry and 3× slower on the real FID-generation
sampling path (batch 250) — and the training step cannot use it without a
full second-order AD kernel family (see ROADMAP "Image-path verdict", with
PROFILE_image_r4.json showing the step is 94% conv arithmetic already at
~39 TFLOP/s effective bf16 under XLA).
Parity: tests/test_ops.py::test_fused_coupler_stack_matches_resnet.
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

_LANES = 128


def _env_interpret():
    return os.environ.get("CMF_TPU_PALLAS_INTERPRET", "") == "1"


def fused_coupler_available():
    if not _PALLAS_OK:
        return False
    platform = jax.devices()[0].platform
    return platform == "tpu" or (platform == "cpu" and _env_interpret())


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _taps(w_img):
    """(dy, dx) offsets in kernel order for a 3×3 conv of width w_img."""
    return [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _tap_masks(h_img, w_img, p_pad):
    """(9, p_pad) float32 validity masks: mask[k, q] = 1 iff out-pixel q is a
    real pixel AND its (dy, dx) source lies inside the image."""
    q = np.arange(p_pad)
    y, x = q // w_img, q % w_img
    real = q < h_img * w_img
    masks = np.zeros((9, p_pad), np.float32)
    for k, (dy, dx) in enumerate(_taps(w_img)):
        ok = real & (y + dy >= 0) & (y + dy < h_img) & (x + dx >= 0) & (x + dx < w_img)
        masks[k] = ok.astype(np.float32)
    return masks


def _conv3x3(h, w_ref, b, masks_ref, w_img, bf16, stack_taps):
    """h: (I, L) → (O, L) via the shift-matmul decomposition.

    bf16: cast matmul operands to bfloat16 (fp32 accumulation) — the same
    arithmetic XLA's BFloat16Propagation pass applies to these convs.
    stack_taps: concatenate the 9 shifted maps into one (9I, L) operand so
    the MXU sees K=9·I instead of nine K=I passes (im2col-in-VMEM)."""
    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (lambda a: a)

    shifted = []
    for k, (dy, dx) in enumerate(_taps(w_img)):
        offset = dy * w_img + dx
        # pltpu.roll takes non-negative shifts; negate modulo the lane length
        rolled = pltpu.roll(h, (-offset) % h.shape[1], axis=1) if offset else h
        shifted.append(cast(rolled * masks_ref[k][None, :]))

    if stack_taps:
        stacked = jnp.concatenate(shifted, axis=0)  # (9I, L)
        w_stacked = jnp.concatenate(
            [cast(w_ref[dy + 1, dx + 1]) for dy, dx in
             ((d // 3 - 1, d % 3 - 1) for d in range(9))],
            axis=1,
        )  # (O, 9I)
        acc = jax.lax.dot_general(
            w_stacked, stacked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = None
        for k, (dy, dx) in enumerate(_taps(w_img)):
            term = jax.lax.dot_general(
                cast(w_ref[dy + 1, dx + 1]), shifted[k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
    if b is not None:
        acc = acc + b
    return acc


def _kernel(x_ref, masks_ref, *refs, w_img, num_blocks, bf16, stack_taps):
    # refs: w_in, [w1, b1, w2, b2] * num_blocks, w_out, b_out, head_w,
    #       head_b, out_ref
    out_ref = refs[-1]
    w_in = refs[0]
    tile = masks_ref[...]  # (9, L) — already tiled over the batch chunk
    h = _conv3x3(x_ref[...], w_in, None, tile, w_img, bf16, stack_taps)
    idx = 1
    for _ in range(num_blocks):
        w1, b1, w2, b2 = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
        idx += 4
        t = _conv3x3(jnp.maximum(h, 0.0), w1, b1[...], tile, w_img, bf16, stack_taps)
        t = _conv3x3(jnp.maximum(t, 0.0), w2, b2[...], tile, w_img, bf16, stack_taps)
        h = h + t
    w_out, b_out, head_w, head_b = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    y = jax.lax.dot_general(
        w_out[...], jnp.maximum(h, 0.0), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_out[...]
    out_ref[...] = head_w[...] * jnp.tanh(y) + head_b[...]


def _pack_weights(params, num_blocks):
    """nets.core.ResNet param pytree (batchnorm-free) → kernel operand list.
    3×3 kernels become (3, 3, O, I); biases become (O, 1) columns."""
    def w33(p):
        return jnp.transpose(p["w"], (2, 3, 0, 1))  # (O,I,3,3) → (3,3,O,I)

    ops = [w33(params["conv_in"])]
    for bp in params["blocks"]:
        ops += [w33(bp["conv1"]), bp["conv1"]["b"][:, None],
                w33(bp["conv2"]), bp["conv2"]["b"][:, None]]
    ops += [
        params["conv_out"]["w"][:, :, 0, 0],
        params["conv_out"]["b"][:, None],
        params["head_w"][:, :, 0],  # (c_out, 1)
        params["head_b"][:, :, 0],
    ]
    assert len(params["blocks"]) == num_blocks
    return ops


@functools.partial(jax.jit, static_argnames=("h_img", "w_img", "num_blocks",
                                             "batch_chunk", "interpret",
                                             "bf16", "stack_taps"))
def _call(x_packed, masks_tiled, weight_ops, h_img, w_img, num_blocks,
          batch_chunk, interpret, bf16=False, stack_taps=False):
    c_in, total = x_packed.shape
    p_pad = _round_up(h_img * w_img, _LANES)
    l_block = batch_chunk * p_pad
    grid = (total // l_block,)
    c_out = weight_ops[-1].shape[0]

    in_specs = [
        pl.BlockSpec((c_in, l_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(masks_tiled.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for op in weight_ops:
        in_specs.append(
            pl.BlockSpec(op.shape, functools.partial(lambda nd, i: (0,) * nd, op.ndim),
                         memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_kernel, w_img=w_img, num_blocks=num_blocks,
                          bf16=bf16, stack_taps=stack_taps),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((c_out, l_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_out, total), jnp.float32),
        interpret=interpret,
    )(x_packed, masks_tiled, *weight_ops)


def fused_resnet_coupler(x, params, num_blocks, batch_chunk=None, interpret=None,
                         bf16=False, stack_taps=False):
    """x: (B, C_in, H, W) fp32; params: nets.core.ResNet param pytree with
    use_batchnorm=False. Returns the coupler output (B, c_out, H, W) —
    identical semantics to ResNet.apply (train-independent: no batchnorm).
    bf16/stack_taps select the matmul arithmetic (see _conv3x3)."""
    if interpret is None:
        interpret = _env_interpret() or jax.devices()[0].platform != "tpu"
    b, c_in, h_img, w_img = x.shape
    p = h_img * w_img
    p_pad = _round_up(p, _LANES)
    if batch_chunk is None:
        # target ≤ ~0.75 MB per (64, L) buffer: the unrolled 9-tap conv keeps
        # several temporaries live, and the scoped-VMEM stack limit is 16 MB
        batch_chunk = max(1, min(b, (768 << 10) // (64 * 4 * p_pad)))
        while b % batch_chunk:
            batch_chunk -= 1

    x_packed = jnp.zeros((c_in, b, p_pad), jnp.float32)
    x_packed = x_packed.at[:, :, :p].set(
        jnp.transpose(x.reshape(b, c_in, p), (1, 0, 2))
    )
    x_packed = x_packed.reshape(c_in, b * p_pad)
    masks = jnp.asarray(_tap_masks(h_img, w_img, p_pad))
    masks_tiled = jnp.tile(masks, (1, batch_chunk))
    weight_ops = _pack_weights(params, num_blocks)
    out = _call(x_packed, masks_tiled, tuple(weight_ops), h_img, w_img,
                num_blocks, batch_chunk, bool(interpret), bool(bf16),
                bool(stack_taps))
    c_out = out.shape[0]
    out = out.reshape(c_out, b, p_pad)[:, :, :p]
    return jnp.transpose(out, (1, 0, 2)).reshape(b, c_out, h_img, w_img)
