"""Dense augmented-batch decode + Jacobian for flat non-square chains.

The exact log-det path (reference non_square.py:262-311) pushes the d latent
basis vectors through the decoder. The generic implementation
(``jax.linearize`` + ``vmap`` in densities/nonsquare.py) is correct for any
chain, but for the flat RealNVP decode stacks used by every tabular and 2-D
non-square config it compiles to a poor TPU program: the alternating-channel
couplings gather/concat/permute activations (whose autodiff transposes become
scatter-adds), and the vmapped tangent chain materialises every primal
coefficient broadcast over the tangent axis — on a v5e the broadcast/copy/
data-formatting overhead is ~25% of the train step and the matmuls run with
K=22-sized contractions.

This module rewrites that computation as ONE dense augmented-batch program:

* the primal point and the d Jacobian columns travel together in a single
  ``(B, d+1, D)`` tensor (group 0 = primal, groups 1..d = tangent columns);
* the tail zero-pad + inverse-permute (non_square.py:397-404) becomes the
  initial augmented tensor construction;
* each inverse affine coupling (acl.py:43-46: x = z·e^{−s} − t) folds its
  channel gather/scatter into zero-padded weight matrices, so every coupler
  MLP layer is a single ``(B·(d+1), C) @ (C, H)`` matmul — MXU-shaped, no
  gathers, no scatters, no tangent-axis broadcasts;
* the activation/coupling tangent rules are written out explicitly
  (σ′(h)⊙t for the hidden activations; e^{−s}(t_z − z⊙t_s) − t_t for the
  coupling), so the whole thing is plain first-order JAX code — autodiff
  through it yields the exact second-order terms the log-det gradient needs
  with none of the ``linearize``-transpose structure.

``extract_dense_decode_program`` walks a non-square head's prior tree and
returns a program when every layer is supported (flat View/Flip/random
permutation reshaping, BatchNorm bijections, channelwise ACLs with MLP
couplers, ending in the NonSquareTail); anything else → ``None`` and the
caller falls back to the generic path. Numerics match the generic path to
fp32 round-off (same formulas; contraction order differs only by folded-in
zero rows).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..nets.core import _matmul


def _fetch(tree, path):
    for key in path:
        tree = tree[key]
    return tree


class _DenseDecodeProgram:
    """Decode-order step list over a flat chain. Steps reference parameter /
    state sub-trees of the head's prior variables by key-path."""

    def __init__(self, steps, tail_path, flat_dim, latent_dim):
        self.steps = steps
        self.tail_path = tail_path
        self.flat_dim = flat_dim
        self.latent_dim = latent_dim

    # ------------------------------------------------------------- helpers
    @staticmethod
    def _aug_act(U, activation):
        """Augmented activation: primal group gets σ, tangents σ′(primal)⊙t."""
        U0 = U[:, :1]
        if activation is jnp.tanh:
            a = jnp.tanh(U0)
            deriv = 1.0 - a * a
        else:  # relu
            a = jax.nn.relu(U0)
            deriv = (U0 > 0).astype(U.dtype)
        return jnp.concatenate([a, deriv * U[:, 1:]], axis=1)

    @staticmethod
    def _primal_bias(b, d):
        """(1, d+1, H) bias tensor that only touches the primal group."""
        return jnp.concatenate([b[None], jnp.zeros((d, b.shape[0]), b.dtype)], axis=0)[None]

    def _acl_weights(self, step, params):
        """Fold the channel selection into zero-padded first/last weights."""
        D = self.flat_dim
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
            [x0[:, None, :], jnp.broadcast_to(basis[None], (B, d, D))], axis=1
        )
        X = X[:, :, tail_state["inverse_permutation"]]

        for step in self.steps:
            kind = step["kind"]
            if kind == "acl":
                w1e, b1, mids, ws_e, bs_e, wl_e, bl_e = self._acl_weights(step, params)
                H = _matmul(X, w1e) + self._primal_bias(b1, d)
                for layer in mids:
                    H = self._aug_act(H, step["activation"])
                    H = _matmul(H, layer["w"]) + self._primal_bias(layer["b"], d)
                H = self._aug_act(H, step["activation"])
                S = _matmul(H, ws_e) + self._primal_bias(bs_e, d)
                L = _matmul(H, wl_e) + self._primal_bias(bl_e, d)
                E0 = jnp.exp(-L[:, :1])
                out0 = E0 * X[:, :1] - S[:, :1]
                outt = E0 * (X[:, 1:] - X[:, :1] * L[:, 1:]) - S[:, 1:]
                X = jnp.concatenate([out0, outt], axis=1)
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
                X = jnp.concatenate(
                    [X[:, :1] * scale + shift, X[:, 1:] * scale], axis=1
                )
            elif kind == "perm":
                s = _fetch(state, step["path"] + ("bijection",))
                X = X[:, :, s["inverse_permutation"]]
            elif kind == "flip":
                X = jnp.flip(X, axis=-1)
            else:  # pragma: no cover
                raise AssertionError(kind)

        recon = X[:, 0]
        jac_cols = jnp.moveaxis(X[:, 1:], 0, 1)  # (d, B, D)
        return recon, jac_cols


def extract_dense_decode_program(head):
    """Walk ``head.prior``; return a ``_DenseDecodeProgram`` when every layer
    of the decode chain is supported, else ``None``."""
    from ..bijections.base import Bijection  # noqa: F401  (import cycle guard)
    from ..bijections.batchnorm import BatchNormBijection
    from ..bijections.coupling import (
        AlternatingChannelwiseCouplingBijection,
        MaskedChannelwiseCouplingBijection,
        SplitChannelwiseCouplingBijection,
    )
    from ..bijections.reshaping import (
        FlipBijection,
        RandomChannelwisePermutationBijection,
        ViewBijection,
    )
    from ..couplers import ChunkedSharedCoupler, IndependentCoupler
    from ..densities.exact import BijectionDensity
    from ..densities.nonsquare import NonSquareTailDensity
    from ..nets.core import MLP

    def mlp_ok(net):
        return isinstance(net, MLP) and net.activation in (jnp.tanh, jax.nn.relu)

    steps_down = []
    path = ()
    node = getattr(head, "prior", None)
    if node is None:
        return None
    while True:
        if isinstance(node, NonSquareTailDensity):
            tail_path = path
            flat_dim = node.flattened_dims
            latent_dim = node.latent_dimension
            break
        if not isinstance(node, BijectionDensity):
            return None
        bij = node.bijection
        if isinstance(bij, ViewBijection):
            pass  # flat reshape: identity on (B, D)
        elif isinstance(bij, FlipBijection):
            if len(bij.x_shape) != 1 or bij.axis != 1:
                return None
            steps_down.append({"kind": "flip"})
        elif isinstance(bij, RandomChannelwisePermutationBijection):
            if len(bij.x_shape) != 1:
                return None
            steps_down.append({"kind": "perm", "path": path})
        elif isinstance(bij, BatchNormBijection):
            if len(bij.x_shape) != 1:
                return None
            steps_down.append({"kind": "bn", "path": path, "bij": bij})
        elif isinstance(
            bij,
            (
                AlternatingChannelwiseCouplingBijection,
                SplitChannelwiseCouplingBijection,
                MaskedChannelwiseCouplingBijection,
            ),
        ):
            if len(bij.x_shape) != 1:
                return None
            coupler = bij.coupler
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
    return _DenseDecodeProgram(steps, tail_path, flat_dim, latent_dim)
