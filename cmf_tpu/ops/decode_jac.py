"""Dense augmented-batch decode + Jacobian for non-square chains.

The exact log-det path (reference non_square.py:262-311) pushes the d latent
basis vectors through the decoder. The generic implementation
(``jax.linearize`` + ``vmap`` in densities/nonsquare.py) is correct for any
chain, but compiles to a poor TPU program: the couplings gather/concat/permute
activations (whose autodiff transposes become scatter-adds), and the vmapped
tangent chain materialises every primal coefficient broadcast over the tangent
axis — on a v5e the broadcast/copy/data-formatting overhead is ~25% of the
tabular train step, and on the mnist multiscale config the 20-column fan-out
costs 132 ms vs 30 ms for a single decode forward (4.4×, where the pure conv
FLOP ratio would be 21× — the machine is formatting-bound, not compute-bound).

This module rewrites that computation as ONE dense augmented-batch program:
the primal point and the d Jacobian columns travel together in a single
``(d+1, B, ...)`` tensor — group axis LEADING (group 0 = primal, groups 1..d
= tangent columns). The leading group axis is load-bearing on TPU: group
slices (``X[:1]``), group concatenations and the ``(G, B) → (G·B)`` batch
merge for convolutions are all contiguous leading-dimension ops that XLA
lowers without relayout copies, whereas a middle group axis forced a 220 MB
copy per slice/concat under the (8,128) tiled layout (measured 655 ms for the
mnist fan-out vs 132 ms generic; leading-group fixes this).

Flat stages (tabular / 2-D chains, and the post-tail stage of image chains):

* the tail zero-pad + inverse-permute (non_square.py:397-404) becomes the
  initial augmented tensor construction;
* each inverse affine coupling (acl.py:43-46: x = z·e^{−s} − t) folds its
  channel gather/scatter into zero-padded weight matrices, so every coupler
  MLP layer is a single ``((d+1)·B, C) @ (C, H)`` matmul — MXU-shaped, no
  gathers, no scatters, no tangent-axis broadcasts.

Conv stages (the multiscale image decode, schemas.py:380-439 →
reference acl.py:29-78 checkerboard / acl.py:169-189 split-channel with
ResNet couplers, networks.py:116-161):

* every convolution runs once over the merged ``(G·B, C, H, W)`` batch —
  tangent pushforward and primal share the same MXU pass (a conv is linear;
  only the primal group receives the bias);
* ReLU becomes one fused gate ``X ⊙ 1{X₀ > 0}`` (for the primal group this IS
  relu(x₀); for tangents it is the JVP rule σ′(x₀)⊙t);
* the scaled-tanh coupler head and the coupling inverse apply their explicit
  tangent rules (w·(1−tanh²(h₀))⊙t; e^{−s}(t_z − z⊙t_s) − t_t);
* squeeze (reshaping.py:69-115), multi-scale SplitDensity zero-padding
  (split.py:32-52) and per-channel batch-norm denormalisation ride along as
  group-preserving reshapes / affine maps;
* each ResNet coupler evaluation is wrapped in ``jax.checkpoint``: the
  backward pass recomputes the 64-channel hidden activations per coupler
  instead of storing all of them (storing them needs ~22 GB at the mnist
  geometry; rematerialisation caps residency at one coupler's activations).

The whole program is plain first-order JAX code — autodiff through it yields
the exact second-order terms the log-det gradient needs with none of the
``linearize``-transpose structure.

``extract_dense_decode_program`` walks a non-square head's prior tree and
returns a program when every layer of the decode chain is supported; anything
else → ``None`` and the caller falls back to the generic path. Numerics match
the generic path to fp32 round-off (same formulas; contraction order differs
only by folded-in zero rows / merged conv batches).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..nets.core import _conv2d, _matmul


def _fetch(tree, path):
    for key in path:
        tree = tree[key]
    return tree


class _DenseDecodeProgram:
    """Decode-order step list over a non-square chain. Steps reference
    parameter / state sub-trees of the head's prior variables by key-path.
    Augmented tensors are group-leading: (d+1, B, ...)."""

    def __init__(self, steps, tail_path, tail_shape, flat_dim, latent_dim, has_conv):
        self.steps = steps
        self.tail_path = tail_path
        self.tail_shape = tuple(tail_shape)
        self.flat_dim = flat_dim
        self.latent_dim = latent_dim
        # True when the chain contains conv-coupler stages — the exact-Gram
        # Hutchinson 'auto' rule keys off this (the d-column fan-out through a
        # conv stack costs ~d conv passes; iterative CG at the reference's
        # loose relative tolerance costs ~4, see densities/nonsquare.py).
        self.has_conv = has_conv

    # ----------------------------------------------------- flat-MLP helpers
    #
    # Flat stages avoid slice+concat group recombination entirely: the v5e
    # per-op profile (PROFILE_tabular_r5.json) showed 34.7% of the flagship
    # step's device time in copy-done ops — the (d, B, H) tangent-half copies
    # each `concatenate([primal_out, tangent_out], axis=0)` materialises (and
    # their backward slices). Every group-dependent op is instead written as
    # ONE whole-group formula gated by a (d+1, 1, 1) primal mask, which XLA
    # fuses into the surrounding elementwise work with no relayout traffic.

    @staticmethod
    def _mask0(d, dtype):
        """(d+1, 1, 1) indicator of the primal group."""
        return jnp.zeros((d + 1, 1, 1), dtype).at[0].set(1.0)

    @staticmethod
    def _aug_act(U, activation):
        """Augmented activation: primal group gets σ, tangents σ′(primal)⊙t.
        σ is evaluated on the primal slice only; both groups recombine through
        the mask broadcast (no concatenate)."""
        m0 = _DenseDecodeProgram._mask0(U.shape[0] - 1, U.dtype)
        U0 = U[:1]
        if activation is jnp.tanh:
            a = jnp.tanh(U0)
            deriv = 1.0 - a * a
        else:  # relu
            a = jax.nn.relu(U0)
            deriv = (U0 > 0).astype(U.dtype)
        return m0 * a + (1.0 - m0) * deriv * U

    @staticmethod
    def _primal_bias(b, d):
        """(d+1, 1, H) bias that only touches the primal group (fuses as a
        broadcast-multiply instead of materialising a zero-padded tensor)."""
        return _DenseDecodeProgram._mask0(d, b.dtype) * b[None, None]

    def _acl_weights(self, step, params):
        """Fold the channel selection into zero-padded first/last weights."""
        D = step["dim"]
        pass_idx, mod_idx = step["pass_idx"], step["mod_idx"]
        m = mod_idx.shape[0]

        def mlp_layers(p):
            return p["layers"]

        cp = _fetch(params, step["path"] + ("bijection", "coupler"))
        if step["coupler_kind"] == "chunked":
            layers = mlp_layers(cp)
            first, mids, last = layers[0], layers[1:-1], layers[-1]
            w_last, b_last = last["w"], last["b"]
            ws, wl = w_last[:, :m], w_last[:, m:]
            bs, bl = b_last[:m], b_last[m:]
        else:  # independent shift / log-scale nets (shared hidden sizes)
            s_layers = mlp_layers(cp["shift"])
            l_layers = mlp_layers(cp["log_scale"])
            # Stack the two nets side by side: shared input, concatenated
            # hiddens (block-diagonal mids), concatenated outputs.
            first = {
                "w": jnp.concatenate([s_layers[0]["w"], l_layers[0]["w"]], axis=1),
                "b": jnp.concatenate([s_layers[0]["b"], l_layers[0]["b"]]),
            }
            mids = []
            for sl, ll in zip(s_layers[1:-1], l_layers[1:-1]):
                hs, hl = sl["w"].shape[0], ll["w"].shape[0]
                top = jnp.concatenate([sl["w"], jnp.zeros((hs, ll["w"].shape[1]))], axis=1)
                bot = jnp.concatenate([jnp.zeros((hl, sl["w"].shape[1])), ll["w"]], axis=1)
                mids.append({
                    "w": jnp.concatenate([top, bot], axis=0),
                    "b": jnp.concatenate([sl["b"], ll["b"]]),
                })
            hs = s_layers[-1]["w"].shape[0]
            hl = l_layers[-1]["w"].shape[0]
            ws = jnp.concatenate([s_layers[-1]["w"], jnp.zeros((hl, m))], axis=0)
            wl = jnp.concatenate([jnp.zeros((hs, m)), l_layers[-1]["w"]], axis=0)
            bs, bl = s_layers[-1]["b"], l_layers[-1]["b"]

        h1 = first["w"].shape[1]
        w1e = jnp.zeros((D, h1), first["w"].dtype).at[pass_idx].set(first["w"])
        h_last = ws.shape[0]
        ws_e = jnp.zeros((h_last, D), ws.dtype).at[:, mod_idx].set(ws)
        wl_e = jnp.zeros((h_last, D), wl.dtype).at[:, mod_idx].set(wl)
        bs_e = jnp.zeros((D,), bs.dtype).at[mod_idx].set(bs)
        bl_e = jnp.zeros((D,), bl.dtype).at[mod_idx].set(bl)
        return w1e, first["b"], mids, ws_e, bs_e, wl_e, bl_e

    def _flat_acl(self, step, params, X, d):
        w1e, b1, mids, ws_e, bs_e, wl_e, bl_e = self._acl_weights(step, params)
        H = _matmul(X, w1e) + self._primal_bias(b1, d)
        for layer in mids:
            H = self._aug_act(H, step["activation"])
            H = _matmul(H, layer["w"]) + self._primal_bias(layer["b"], d)
        H = self._aug_act(H, step["activation"])
        S = _matmul(H, ws_e) + self._primal_bias(bs_e, d)
        L = _matmul(H, wl_e) + self._primal_bias(bl_e, d)
        # One whole-group inverse-coupling formula (primal: e^{−s}x − t;
        # tangent: e^{−s}(t_x − x₀·t_s) − t_t), gated by the primal mask.
        m0 = self._mask0(d, X.dtype)
        E0 = jnp.exp(-L[:1])
        return E0 * (X - X[:1] * ((1.0 - m0) * L)) - S

    # --------------------------------------------------- conv-stage helpers
    @staticmethod
    def _relu_gate(X):
        """X ⊙ 1{X₀>0}: relu for the primal group, its JVP for tangents.
        The group-0 slice is a contiguous leading-dim view — no relayout."""
        return X * (X[:1] > 0).astype(X.dtype)

    @staticmethod
    def _conv(X, w, b=None):
        """Conv over the merged (G·B, C, H, W) batch; the (G, B) merge is a
        leading-dims reshape — free under TPU tiled layouts. Bias touches
        only the primal group."""
        G, B = X.shape[:2]
        out = _conv2d(X.reshape(G * B, *X.shape[2:]), w)
        out = out.reshape(G, B, *out.shape[1:])
        if b is not None:
            mask = jnp.zeros((G, 1, 1, 1, 1), out.dtype).at[0].set(1.0)
            out = out + mask * b[None, None, :, None, None]
        return out

    def _resnet_aug(self, p, X):
        """Augmented ResNet coupler forward (networks.py:116-161 without
        batch-norm, which the image non-square configs disable —
        images.py `resnet_batchnorm: False`)."""
        out = self._conv(X, p["conv_in"]["w"])  # bias-free (core.py init)
        for bp in p["blocks"]:
            h = self._relu_gate(out)
            h = self._conv(h, bp["conv1"]["w"], bp["conv1"].get("b"))
            h = self._relu_gate(h)
            h = self._conv(h, bp["conv2"]["w"], bp["conv2"].get("b"))
            out = out + h
        out = self._relu_gate(out)
        out = self._conv(out, p["conv_out"]["w"], p["conv_out"]["b"])
        # Scaled-tanh head (networks.py:96-113): w·tanh(h)+b on the primal,
        # w·(1−tanh²(h₀))·t on tangents.
        h0 = out[:1]
        th = jnp.tanh(h0)
        hw = p["head_w"][None, None]
        hb = p["head_b"][None, None]
        primal = hw * th + hb
        tang = hw * (1.0 - th * th) * out[1:]
        return jnp.concatenate([primal, tang], axis=0)

    def _coupler_out(self, step, params, Cin):
        cp = _fetch(params, step["path"] + ("bijection", "coupler"))
        # Rematerialise: backward recomputes this coupler's hidden conv
        # activations instead of keeping ~(G·B, 64, H, W) alive per conv.
        out = jax.checkpoint(self._resnet_aug)(cp, Cin)
        c = out.shape[2]
        return out[:, :, : c // 2], out[:, :, c // 2 :]  # shift, log-scale

    def _conv_acl(self, step, params, X):
        if step["mode"] == "checkerboard":
            m = step["mask"][None]  # (1, 1, 1, H, W) — broadcasts over (G,B,C)
            S_, L_ = self._coupler_out(step, params, m * X)
            E0 = jnp.exp(-L_[:1])
            x0 = m * X[:1] + (1 - m) * (X[:1] * E0 - S_[:1])
            xt = m * X[1:] + (1 - m) * (
                E0 * (X[1:] - X[:1] * L_[1:]) - S_[1:]
            )
            return jnp.concatenate([x0, xt], axis=0)
        # channel-split (acl.py:169-189): passthrough channels drive the
        # coupler; modified channels invert as x = z·e^{−s} − t.
        C = X.shape[2]
        n_pass = step["num_passthrough"]
        if step["reverse_mask"]:
            pas, mod = X[:, :, C - n_pass :], X[:, :, : C - n_pass]
        else:
            pas, mod = X[:, :, :n_pass], X[:, :, n_pass:]
        S_, L_ = self._coupler_out(step, params, pas)
        E0 = jnp.exp(-L_[:1])
        mod0 = mod[:1] * E0 - S_[:1]
        modt = E0 * (mod[1:] - mod[:1] * L_[1:]) - S_[1:]
        mod_new = jnp.concatenate([mod0, modt], axis=0)
        parts = [mod_new, pas] if step["reverse_mask"] else [pas, mod_new]
        return jnp.concatenate(parts, axis=2)

    # ----------------------------------------------------------------- run
    def __call__(self, pv, z, train=False):
        """pv = the head prior's variables (post-forward state); z (B, d).
        Returns (recon_flat (B, D), jac_cols (d, B, D))."""
        params, state = pv["params"], pv["state"]
        B, d = z.shape
        D = self.flat_dim
        assert d == self.latent_dim

        tail_state = _fetch(state, self.tail_path)
        x0 = jnp.zeros((B, D), z.dtype).at[:, :d].set(z)
        basis = jnp.zeros((d, D), z.dtype).at[:, :d].set(jnp.eye(d, dtype=z.dtype))
        X = jnp.concatenate(
            [x0[None], jnp.broadcast_to(basis[:, None], (d, B, D))], axis=0
        )
        X = X[:, :, tail_state["inverse_permutation"]]
        if len(self.tail_shape) > 1:
            X = X.reshape(d + 1, B, *self.tail_shape)

        for step in self.steps:
            kind = step["kind"]
            if kind == "acl":
                X = self._flat_acl(step, params, X, d)
            elif kind == "conv_acl":
                X = self._conv_acl(step, params, X)
            elif kind == "bn":
                bij = step["bij"]
                p = _fetch(params, step["path"] + ("bijection",))
                s = _fetch(state, step["path"] + ("bijection",))
                mean = s["batch_mean"] if train else s["running_mean"]
                var = s["batch_var"] if train else s["running_var"]
                scale = jnp.sqrt(var + bij.eps)
                shift = mean
                if bij.apply_affine:
                    scale = scale * jnp.exp(-p["log_scale"])
                    shift = shift - p["shift"] * scale
                # Whole-group affine: the shift touches only the primal group.
                m0 = self._mask0(d, X.dtype).reshape((d + 1,) + (1,) * (X.ndim - 1))
                X = X * scale + m0 * shift
            elif kind == "perm":
                s = _fetch(state, step["path"] + ("bijection",))
                X = jnp.take(X, s["inverse_permutation"], axis=step["axis"])
            elif kind == "flip":
                X = jnp.flip(X, axis=-1)
            elif kind == "view":
                X = X.reshape(d + 1, B, *step["shape"])
            elif kind == "squeeze_inv":
                # reshaping.py:98-104 glow unsqueeze, with the group axis
                # riding along in front.
                zc, zh, zw = step["z_shape"]
                f = step["factor"]
                c, h, w = step["x_shape"]
                X = X.reshape(d + 1, B, zc // f**2, f, f, zh, zw)
                X = X.transpose(0, 1, 2, 5, 3, 6, 4)
                X = X.reshape(d + 1, B, c, h, w)
            elif kind == "split_pad":
                # Multi-scale factor-out: decode zero-pads the second half
                # (split.py:40-41); tangents pad with zeros likewise.
                X = jnp.concatenate([X, jnp.zeros_like(X)], axis=2)
            else:  # pragma: no cover
                raise AssertionError(kind)

        recon = X[0].reshape(B, -1)
        jac_cols = X[1:].reshape(d, B, -1)
        return recon, jac_cols


def extract_dense_decode_program(head):
    """Walk ``head.prior``; return a ``_DenseDecodeProgram`` when every layer
    of the decode chain is supported, else ``None``."""
    from ..bijections.base import Bijection  # noqa: F401  (import cycle guard)
    from ..bijections.batchnorm import BatchNormBijection
    from ..bijections.coupling import (
        AlternatingChannelwiseCouplingBijection,
        Checkerboard2dCouplingBijection,
        MaskedChannelwiseCouplingBijection,
        SplitChannelwiseCouplingBijection,
    )
    from ..bijections.reshaping import (
        FlipBijection,
        RandomChannelwisePermutationBijection,
        Squeeze2dBijection,
        ViewBijection,
    )
    from ..couplers import ChunkedSharedCoupler, IndependentCoupler
    from ..densities.exact import BijectionDensity
    from ..densities.nonsquare import NonSquareTailDensity
    from ..densities.split import SplitDensity
    from ..nets.core import MLP, ResNet

    def mlp_ok(net):
        return isinstance(net, MLP) and net.activation in (jnp.tanh, jax.nn.relu)

    def resnet_ok(net):
        # Batch-norm inside the coupler mixes batch statistics into the
        # tangent rule (jvp_layers.py:67-88); the image non-square configs
        # disable it (images.py resnet_batchnorm=False) — decline otherwise.
        return isinstance(net, ResNet) and not net.use_batchnorm

    steps_down = []
    has_conv = False
    path = ()
    node = getattr(head, "prior", None)
    if node is None:
        return None
    while True:
        if isinstance(node, NonSquareTailDensity):
            tail_path = path
            tail_shape = node.x_shape
            flat_dim = node.flattened_dims
            latent_dim = node.latent_dimension
            break
        if isinstance(node, SplitDensity):
            if not node.non_square or node.axis != 1:
                return None
            steps_down.append({"kind": "split_pad"})
            path = path + ("density_1",)
            node = node.density_1
            continue
        if not isinstance(node, BijectionDensity):
            return None
        bij = node.bijection
        if isinstance(bij, ViewBijection):
            # Decode applies the inverse reshape (z_shape → x_shape).
            steps_down.append({"kind": "view", "shape": tuple(bij.x_shape)})
        elif isinstance(bij, Squeeze2dBijection):
            steps_down.append(
                {
                    "kind": "squeeze_inv",
                    "factor": bij.factor,
                    "x_shape": tuple(bij.x_shape),
                    "z_shape": tuple(bij.z_shape),
                }
            )
        elif isinstance(bij, FlipBijection):
            if len(bij.x_shape) != 1 or bij.axis != 1:
                return None
            steps_down.append({"kind": "flip"})
        elif isinstance(bij, RandomChannelwisePermutationBijection):
            # Channel axis: -1 for flat stages, 2 for (G, B, C, H, W).
            axis = -1 if len(bij.x_shape) == 1 else 2
            steps_down.append({"kind": "perm", "path": path, "axis": axis})
        elif isinstance(bij, BatchNormBijection):
            # param_shape broadcasts over both (G, B, D) and (G, B, C, H, W).
            steps_down.append({"kind": "bn", "path": path, "bij": bij})
        elif isinstance(bij, Checkerboard2dCouplingBijection):
            if not (
                isinstance(bij.coupler, ChunkedSharedCoupler)
                and resnet_ok(bij.coupler.net)
            ):
                return None
            has_conv = True
            steps_down.append(
                {
                    "kind": "conv_acl",
                    "mode": "checkerboard",
                    "path": path,
                    "mask": bij.mask,  # (1, 1, H, W)
                    "net": bij.coupler.net,
                }
            )
        elif isinstance(
            bij,
            (
                AlternatingChannelwiseCouplingBijection,
                SplitChannelwiseCouplingBijection,
                MaskedChannelwiseCouplingBijection,
            ),
        ):
            coupler = bij.coupler
            if len(bij.x_shape) == 3:
                if not (
                    isinstance(bij, SplitChannelwiseCouplingBijection)
                    and isinstance(coupler, ChunkedSharedCoupler)
                    and resnet_ok(coupler.net)
                ):
                    return None
                has_conv = True
                steps_down.append(
                    {
                        "kind": "conv_acl",
                        "mode": "channel",
                        "path": path,
                        "num_passthrough": bij.num_passthrough,
                        "reverse_mask": bij.reverse_mask,
                        "net": coupler.net,
                    }
                )
                path = path + ("prior",)
                node = node.prior
                continue
            if len(bij.x_shape) != 1:
                return None
            if isinstance(coupler, ChunkedSharedCoupler) and mlp_ok(coupler.net):
                kind, act = "chunked", coupler.net.activation
            elif (
                isinstance(coupler, IndependentCoupler)
                and mlp_ok(coupler.shift_net)
                and mlp_ok(coupler.log_scale_net)
                and len(coupler.shift_net.sizes) == len(coupler.log_scale_net.sizes)
                and coupler.shift_net.activation is coupler.log_scale_net.activation
            ):
                kind, act = "independent", coupler.shift_net.activation
            else:
                return None
            if isinstance(bij, SplitChannelwiseCouplingBijection):
                n = bij.x_shape[0]
                if bij.reverse_mask:
                    pass_idx = np.arange(n - bij.num_passthrough, n)
                    mod_idx = np.arange(n - bij.num_passthrough)
                else:
                    pass_idx = np.arange(bij.num_passthrough)
                    mod_idx = np.arange(bij.num_passthrough, n)
            else:
                pass_idx = np.asarray(bij.pass_idx)
                mod_idx = np.asarray(bij.mod_idx)
            steps_down.append(
                {
                    "kind": "acl",
                    "path": path,
                    "dim": int(bij.x_shape[0]),
                    "pass_idx": pass_idx,
                    "mod_idx": mod_idx,
                    "coupler_kind": kind,
                    "activation": act,
                }
            )
        else:
            return None
        path = path + ("prior",)
        node = node.prior

    # Walk order is x→z (encoder); decode applies inverses innermost-first.
    steps = list(reversed(steps_down))
    return _DenseDecodeProgram(steps, tail_path, tail_shape, flat_dim, latent_dim, has_conv)
