"""Block Neural Autoregressive Flow (De Cao et al. 2019), from scratch.

Replaces the vendored BNAF package the reference wraps
(reference bnaf.py:12-16,26-119; SURVEY.md §2.12). Forward-only bijection.

Design (BNAF paper §3): each masked layer maps (d·a_in) → (d·a_out) with
block-lower-triangular weights; diagonal blocks are strictly positive via an
exp reparameterisation and the rows are weight-normalised. The log-Jacobian of
the composite autoregressive map is accumulated in log-space with
log-matmul-exp of the per-layer log diagonal blocks, with elementwise
activation log-derivatives added between layers; after the final layer each
block is 1×1 and log|det| = Σ_i (log J)_ii.

Activations: the reference's surjective ``SoftLeakyReLU``
f(x) = ε·x + (1−ε)·softplus(x), log f' = log(ε + (1−ε)·σ(x))
(reference bnaf.py:110-119), plus tanh and leaky-relu.

Note: the reference passes ``res=True`` into the vendored BNAF, whose residual
handling only recognises the strings "normal"/"gated" — so the residual flag
is silently a no-op there. We reproduce that behaviour (bool → no residual)
and additionally support the real "normal"/"gated" modes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection


def _logmatmulexp(a, b):
    """log(exp(a) @ exp(b)) along the last two axes, stably.

    a: (..., m, k), b: (..., k, n) → (..., m, n)
    """
    a_max = jnp.max(a, axis=-1, keepdims=True)
    b_max = jnp.max(b, axis=-2, keepdims=True)
    out = jnp.log(
        jnp.einsum("...mk,...kn->...mn", jnp.exp(a - a_max), jnp.exp(b - b_max))
        + 1e-38
    )
    return out + a_max + jnp.swapaxes(b_max, -1, -2)


class _MaskedBlockWeight:
    """One BNAF masked layer: (d·a_in) → (d·a_out)."""

    def __init__(self, in_features, out_features, dim):
        assert in_features % dim == 0 and out_features % dim == 0
        self.n_in, self.n_out, self.dim = in_features, out_features, dim
        self.a_in = in_features // dim
        self.a_out = out_features // dim
        # Block-diagonal mask and strictly-lower block mask (numpy, static).
        mask_d = np.zeros((out_features, in_features), np.float32)
        mask_o = np.zeros((out_features, in_features), np.float32)
        for i in range(dim):
            mask_d[i * self.a_out : (i + 1) * self.a_out, i * self.a_in : (i + 1) * self.a_in] = 1
            mask_o[i * self.a_out : (i + 1) * self.a_out, : i * self.a_in] = 1
        self.mask_d = jnp.asarray(mask_d)
        self.mask_o = jnp.asarray(mask_o)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(self.n_in)
        weight = jax.random.uniform(k1, (self.n_out, self.n_in), minval=-bound, maxval=bound)
        return {
            "weight": weight,
            "diag_weight": jnp.log(
                jax.random.uniform(k2, (self.n_out, 1), minval=0.5, maxval=1.0)
            ),
            "bias": jax.random.uniform(k3, (self.n_out,), minval=-bound, maxval=bound),
        }

    def apply(self, params, x):
        """Returns (y, log_diag_block) with log_diag_block (d, a_out, a_in)."""
        w_tilde = jnp.exp(params["weight"]) * self.mask_d + params["weight"] * self.mask_o
        sq_norm = jnp.sum(w_tilde**2, axis=-1, keepdims=True)
        w = jnp.exp(params["diag_weight"]) * w_tilde / jnp.sqrt(sq_norm)
        # log of the diagonal-block entries of w (positive by construction):
        wpl = params["diag_weight"] + params["weight"] - 0.5 * jnp.log(sq_norm)
        y = x @ w.T + params["bias"]
        # Gather diagonal blocks: (d, a_out, a_in)
        blocks = wpl.reshape(self.dim, self.a_out, self.n_in)
        log_diag = jnp.stack(
            [blocks[i, :, i * self.a_in : (i + 1) * self.a_in] for i in range(self.dim)]
        )
        return y, log_diag


def _soft_leaky_relu(x, eps=0.01):
    out = eps * x + (1 - eps) * jax.nn.softplus(x)
    log_jac = jnp.log(eps + (1 - eps) * jax.nn.sigmoid(x))
    return out, log_jac


def _tanh_act(x):
    return jnp.tanh(x), 2.0 * (np.log(2.0) - x - jax.nn.softplus(-2.0 * x))


def _leaky_relu(x, eps=0.01):
    return jax.nn.leaky_relu(x, eps), jnp.where(x < 0, np.log(eps), 0.0)


_ACTIVATIONS = {
    "soft-leaky-relu": _soft_leaky_relu,
    "tanh": _tanh_act,
    "leaky-relu": _leaky_relu,
}


class BlockNeuralAutoregressiveBijection(Bijection):
    def __init__(self, num_input_channels, num_hidden_layers, hidden_channels_factor, activation, residual):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels
        self.activation = _ACTIVATIONS[activation]
        # Reference parity: the vendored BNAF ignores non-string res values.
        self.res = residual if isinstance(residual, str) else None
        h = num_input_channels * hidden_channels_factor
        self.layers = [_MaskedBlockWeight(num_input_channels, h, num_input_channels)]
        for _ in range(num_hidden_layers):
            self.layers.append(_MaskedBlockWeight(h, h, num_input_channels))
        self.layers.append(_MaskedBlockWeight(h, num_input_channels, num_input_channels))

    def init(self, key):
        keys = jax.random.split(key, len(self.layers) + 1)
        params = {"layers": [l.init(k) for l, k in zip(self.layers, keys[:-1])]}
        if self.res == "gated":
            params["gate"] = jnp.zeros(())
        return {"params": params, "state": {}}

    def forward(self, variables, x, u=None, train=False):
        p = variables["params"]
        out = x
        grad = None  # (B, d, a_out, a_in-of-input=1)
        for i, (layer, lp) in enumerate(zip(self.layers, p["layers"])):
            out, log_diag = layer.apply(lp, out)
            g = jnp.broadcast_to(
                log_diag[None], (x.shape[0],) + log_diag.shape
            )  # (B, d, a_out, a_in)
            grad = g if grad is None else _logmatmulexp(g, grad)
            if i < len(self.layers) - 1:
                out, act_lj = self.activation(out)
                # Elementwise activation derivative: diagonal in log-space,
                # added to every row of the accumulated block.
                act_lj = act_lj.reshape(x.shape[0], self.d, layer.a_out, 1)
                grad = grad + act_lj

        log_j = grad.reshape(x.shape[0], self.d)  # final blocks are 1×1
        if self.res == "normal":
            z = x + out
            log_jac = jnp.sum(jax.nn.softplus(log_j), axis=-1)
        elif self.res == "gated":
            gate = jax.nn.sigmoid(p["gate"])
            z = gate * out + (1 - gate) * x
            log_jac = jnp.sum(
                jnp.logaddexp(log_j + jnp.log(gate), jnp.log(1 - gate)), axis=-1
            )
        else:
            z = out
            log_jac = jnp.sum(log_j, axis=-1)
        return z, log_jac, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        raise NotImplementedError("BNAF has no analytic inverse")
