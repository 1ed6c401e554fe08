"""Planar flows (Rezende & Mohamed 2015) and the CIF-conditional variant.

Reference: planar.py:17-102. Forward-only bijections (no analytic inverse);
the û reparameterisation guarantees invertibility of the map itself.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection
from ..nets import MLP


def _batch_dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def planar_map(z, u, w, b):
    """f(z) = z + û·tanh(wᵀz + b) with û = u + (m(wᵀu) − wᵀu)·w/|w|²
    (planar.py:17-43)."""
    wT_u = _batch_dot(u, w)
    m = -1.0 + jax.nn.softplus(wT_u)
    u_hat = u + (m - wT_u) / jnp.sum(w**2, axis=1, keepdims=True) * w

    inner = _batch_dot(z, w) + b
    f = z + u_hat * jnp.tanh(inner)

    psi = (1.0 - jnp.tanh(inner) ** 2) * w
    log_jac = jnp.log(jnp.abs(1.0 + _batch_dot(psi, u_hat)))
    return f, log_jac[:, 0]


class PlanarBijection(Bijection):
    def __init__(self, num_input_channels):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels

    def init(self, key):
        a = np.sqrt(6.0 / (self.d + 1))
        k1, k2 = jax.random.split(key)
        return {
            "params": {
                "u": jax.random.uniform(k1, (self.d,), minval=-a, maxval=a),
                "w": jax.random.uniform(k2, (self.d,), minval=-a, maxval=a),
                "b": jnp.zeros(1),
            },
            "state": {},
        }

    def forward(self, variables, x, u=None, train=False):
        p = variables["params"]
        bsz = x.shape[0]
        z, log_jac = planar_map(
            x,
            jnp.broadcast_to(p["u"], (bsz, self.d)),
            jnp.broadcast_to(p["w"], (bsz, self.d)),
            jnp.broadcast_to(p["b"], (bsz, 1)),
        )
        return z, log_jac, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        raise NotImplementedError("Planar flows have no analytic inverse")


class ConditionalPlanarBijection(Bijection):
    """(u_planar, w, b) produced by an MLP on the CIF ``u``
    (planar.py:69-102)."""

    def __init__(self, num_input_channels, num_u_channels, cond_hidden_channels, cond_activation):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels
        self.net = MLP(
            n_in=num_u_channels,
            hidden=cond_hidden_channels,
            n_out=2 * num_input_channels + 1,
            activation=cond_activation,
        )

    def init(self, key):
        nv = self.net.init(key)
        return {"params": {"net": nv["params"]}, "state": {"net": nv["state"]}}

    def forward(self, variables, x, u=None, train=False):
        nv = {"params": variables["params"]["net"], "state": variables["state"]["net"]}
        params, _ = self.net.apply(nv, u, train=train)
        planar_u = params[:, : self.d]
        w = params[:, self.d : 2 * self.d]
        b = params[:, 2 * self.d].reshape(-1, 1)
        z, log_jac = planar_map(x, planar_u, w, b)
        return z, log_jac, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        raise NotImplementedError("Planar flows have no analytic inverse")
