"""Rational-quadratic spline bijections (neural spline flows).

Rebuilds from scratch the functionality the reference vendors from the nsf
submodule (reference nsf.py:7-14,57-114; SURVEY.md §2.12):
``PiecewiseRationalQuadraticCouplingTransform`` and the masked autoregressive
variant, both with "linear tails" outside [-B, B].

The spline itself follows Durkan et al. 2019 (arXiv:1906.04032, eqs. 4-8):
monotone rational-quadratic segments through K+1 knots with K-1 free interior
derivatives; identity beyond the tail bound. Bin search is a vectorised
``searchsorted`` — static shapes, no data-dependent control flow, TPU-friendly.

Parameterisation constants match nsf defaults: min bin width/height 1e-3,
min derivative 1e-3, unnormalised widths/heights softmaxed, derivatives
softplus'd; inputs outside the interval pass through with zero log-det.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection
from ..couplers import ChunkedSharedCoupler
from ..nets import MLP, AutoregressiveMLP

_MIN_BIN_WIDTH = 1e-3
_MIN_BIN_HEIGHT = 1e-3
_MIN_DERIVATIVE = 1e-3


def _compute_knots(unnormalized_widths, unnormalized_heights, unnormalized_derivs, tail_bound):
    """Normalise raw spline parameters into knot positions and derivatives.

    Shapes: (..., K) widths/heights, (..., K-1) interior derivatives.
    Returns cumwidths (..., K+1), widths, cumheights, heights, derivs (..., K+1)
    where boundary derivatives are pinned so the spline continues the identity
    tails with slope 1 (softplus(c)=1 at the boundary, Durkan et al. §3).
    """
    K = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = _MIN_BIN_WIDTH + (1 - _MIN_BIN_WIDTH * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.concatenate([jnp.zeros_like(cumwidths[..., :1]), cumwidths], axis=-1)
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = _MIN_BIN_HEIGHT + (1 - _MIN_BIN_HEIGHT * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.concatenate([jnp.zeros_like(cumheights[..., :1]), cumheights], axis=-1)
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # Boundary derivative constant: softplus(x)=1 ⇒ x = log(e−1).
    const = float(np.log(np.expm1(1 - _MIN_DERIVATIVE)))
    pad = jnp.full_like(unnormalized_derivs[..., :1], const)
    unnorm_d = jnp.concatenate([pad, unnormalized_derivs, pad], axis=-1)
    derivs = _MIN_DERIVATIVE + jax.nn.softplus(unnorm_d)

    return cumwidths, widths, cumheights, heights, derivs


def rational_quadratic_spline(inputs, uw, uh, ud, tail_bound, inverse=False):
    """Elementwise RQ spline with linear tails.

    inputs: (...,); uw/uh: (..., K); ud: (..., K-1).
    Returns (outputs, log_abs_det) elementwise.
    """
    cumwidths, widths, cumheights, heights, derivs = _compute_knots(uw, uh, ud, tail_bound)

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    # Clamp for safe gather; outside values are overwritten at the end.
    x_safe = jnp.clip(inputs, -tail_bound, tail_bound)

    locate_in = cumheights if inverse else cumwidths
    # searchsorted over the last axis, batched: sum of (knot <= x) - 1
    idx = jnp.sum(locate_in[..., :-1] <= x_safe[..., None], axis=-1) - 1
    idx = jnp.clip(idx, 0, widths.shape[-1] - 1)

    def take(a):
        return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]

    in_cw = take(cumwidths[..., :-1])
    in_w = take(widths)
    in_ch = take(cumheights[..., :-1])
    in_h = take(heights)
    d_k = take(derivs[..., :-1])
    d_k1 = take(derivs[..., 1:])
    s = in_h / in_w  # segment slope

    if not inverse:
        theta = (x_safe - in_cw) / in_w
        theta_1m = theta * (1 - theta)
        numerator = in_h * (s * theta**2 + d_k * theta_1m)
        denominator = s + (d_k1 + d_k - 2 * s) * theta_1m
        outputs = in_ch + numerator / denominator
        dnum = s**2 * (d_k1 * theta**2 + 2 * s * theta_1m + d_k * (1 - theta) ** 2)
        log_det = jnp.log(dnum) - 2 * jnp.log(denominator)
    else:
        y_rel = x_safe - in_ch
        a = in_h * (s - d_k) + y_rel * (d_k1 + d_k - 2 * s)
        b = in_h * d_k - y_rel * (d_k1 + d_k - 2 * s)
        c = -s * y_rel
        disc = b**2 - 4 * a * c
        disc = jnp.maximum(disc, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(disc))
        outputs = root * in_w + in_cw
        theta_1m = root * (1 - root)
        denominator = s + (d_k1 + d_k - 2 * s) * theta_1m
        dnum = s**2 * (d_k1 * root**2 + 2 * s * theta_1m + d_k * (1 - root) ** 2)
        log_det = -(jnp.log(dnum) - 2 * jnp.log(denominator))

    outputs = jnp.where(inside, outputs, inputs)
    log_det = jnp.where(inside, log_det, 0.0)
    return outputs, log_det


class _ResidualMLP:
    """Pre-activation residual MLP standing in for nsf's ResidualNet
    (reference nsf.py:88-114): dense in → N residual blocks (two dense layers
    each) → dense out."""

    def __init__(self, n_in, n_hidden, n_blocks, n_out, activation):
        self.n_in, self.n_hidden, self.n_blocks, self.n_out = n_in, n_hidden, n_blocks, n_out
        self.activation = activation

    def init(self, key):
        from ..nets.core import _dense_init

        keys = jax.random.split(key, 2 + 2 * self.n_blocks)
        params = {
            "in": _dense_init(keys[0], self.n_in, self.n_hidden),
            "out": _dense_init(keys[1], self.n_hidden, self.n_out),
            "blocks": [
                {
                    "l1": _dense_init(keys[2 + 2 * i], self.n_hidden, self.n_hidden),
                    "l2": _dense_init(keys[3 + 2 * i], self.n_hidden, self.n_hidden),
                }
                for i in range(self.n_blocks)
            ],
        }
        return {"params": params, "state": {}}

    def apply(self, variables, x, train=False):
        p = variables["params"]
        h = x @ p["in"]["w"] + p["in"]["b"]
        for blk in p["blocks"]:
            t = self.activation(h)
            t = t @ blk["l1"]["w"] + blk["l1"]["b"]
            t = self.activation(t)
            t = t @ blk["l2"]["w"] + blk["l2"]["b"]
            h = h + t
        out = h @ p["out"]["w"] + p["out"]["b"]
        return out, variables["state"]


class CoupledRationalQuadraticSplineBijection(Bijection):
    """RQ-spline coupling over flat inputs with an alternating binary mask
    (reference nsf.py:57-86: create_alternating_binary_mask + ResidualNet)."""

    def __init__(
        self,
        num_input_channels,
        num_hidden_layers,
        num_hidden_channels,
        num_bins,
        tail_bound,
        activation,
        dropout_probability=0.0,
        reverse_mask=False,
    ):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels
        self.num_bins = num_bins
        self.tail_bound = float(tail_bound)
        mask = np.zeros(num_input_channels, dtype=bool)
        mask[(1 if reverse_mask else 0) :: 2] = True  # identity (passthrough) half
        self.pass_idx = jnp.asarray(np.nonzero(mask)[0])
        self.mod_idx = jnp.asarray(np.nonzero(~mask)[0])
        self.inv_perm = jnp.asarray(
            np.argsort(np.concatenate([np.nonzero(mask)[0], np.nonzero(~mask)[0]]))
        )
        n_mod = int((~mask).sum())
        self.n_mod = n_mod
        self.params_per_dim = 3 * num_bins - 1
        self.net = _ResidualMLP(
            n_in=int(mask.sum()),
            n_hidden=num_hidden_channels,
            n_blocks=num_hidden_layers,
            n_out=n_mod * self.params_per_dim,
            activation=activation,
        )

    def init(self, key):
        nv = self.net.init(key)
        return {"params": {"net": nv["params"]}, "state": {"net": nv["state"]}}

    def _spline_params(self, variables, passthrough, train):
        nv = {"params": variables["params"]["net"], "state": variables["state"]["net"]}
        raw, _ = self.net.apply(nv, passthrough, train=train)
        raw = raw.reshape(passthrough.shape[0], self.n_mod, self.params_per_dim)
        K = self.num_bins
        return raw[..., :K], raw[..., K : 2 * K], raw[..., 2 * K :]

    def _transform(self, variables, x, train, inverse):
        passthrough = x[:, self.pass_idx]
        modified = x[:, self.mod_idx]
        uw, uh, ud = self._spline_params(variables, passthrough, train)
        out, log_det = rational_quadratic_spline(
            modified, uw, uh, ud, self.tail_bound, inverse=inverse
        )
        combined = jnp.concatenate([passthrough, out], axis=1)[:, self.inv_perm]
        return combined, jnp.sum(log_det, axis=1)

    def forward(self, variables, x, u=None, train=False):
        z, lj = self._transform(variables, x, train, inverse=False)
        return z, lj, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        x, lj = self._transform(variables, z, train, inverse=True)
        return x, lj


class AutoregressiveRationalQuadraticSplineBijection(Bijection):
    """Masked autoregressive RQ-spline transform (reference nsf.py:95-114).

    Forward (x→z) is one AR pass; inverse loops over dimensions (unrolled —
    used for low-dim latent priors where d is small).
    """

    def __init__(
        self,
        num_input_channels,
        num_hidden_layers,
        num_hidden_channels,
        num_bins,
        tail_bound,
        activation,
        dropout_probability=0.0,
    ):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels
        self.num_bins = num_bins
        self.tail_bound = float(tail_bound)
        self.params_per_dim = 3 * num_bins - 1
        self.net = AutoregressiveMLP(
            n_in=num_input_channels,
            hidden=[num_hidden_channels] * max(1, num_hidden_layers),
            num_output_heads=self.params_per_dim,
            activation=activation,
        )

    def init(self, key):
        nv = self.net.init(key)
        return {"params": {"net": nv["params"]}, "state": {"net": nv["state"]}}

    def _spline_params(self, variables, x, train):
        nv = {"params": variables["params"]["net"], "state": variables["state"]["net"]}
        raw, _ = self.net.apply(nv, x, train=train)  # (B, P, d)
        raw = jnp.moveaxis(raw, 1, 2)  # (B, d, P)
        K = self.num_bins
        return raw[..., :K], raw[..., K : 2 * K], raw[..., 2 * K :]

    def forward(self, variables, x, u=None, train=False):
        uw, uh, ud = self._spline_params(variables, x, train)
        z, log_det = rational_quadratic_spline(x, uw, uh, ud, self.tail_bound, inverse=False)
        return z, jnp.sum(log_det, axis=1), variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        x = jnp.zeros_like(z)
        log_det = jnp.zeros_like(z)
        for _ in range(self.d):
            uw, uh, ud = self._spline_params(variables, x, train)
            x_new, ld = rational_quadratic_spline(z, uw, uh, ud, self.tail_bound, inverse=True)
            x, log_det = x_new, ld
        return x, jnp.sum(log_det, axis=1)
