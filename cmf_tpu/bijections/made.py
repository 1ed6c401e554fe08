"""MADE autoregressive bijection (reference made.py:12-69).

Forward (x→z, the cheap direction) is one AR-MLP pass:
z_i = (x_i − μ_i(x_<i))·exp(−s_i(x_<i)). Inverse loops over dimensions; the
Python loop is traced and unrolled by XLA (dimension count is static and
small for the tabular/2-D models where MADE is used).
"""

import jax.numpy as jnp

from .base import Bijection
from ..couplers import IndexedSharedCoupler
from ..nets import AutoregressiveMLP


class MADEBijection(Bijection):
    def __init__(self, num_input_channels, hidden_channels, activation):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels
        self.coupler = IndexedSharedCoupler(
            AutoregressiveMLP(
                n_in=num_input_channels,
                hidden=hidden_channels,
                num_output_heads=2,
                activation=activation,
            )
        )

    def init(self, key):
        cv = self.coupler.init(key)
        return {"params": {"coupler": cv["params"]}, "state": {"coupler": cv["state"]}}

    def _couple(self, variables, inputs, train):
        cv = {"params": variables["params"]["coupler"], "state": variables["state"]["coupler"]}
        shift, log_scale, _ = self.coupler.apply(cv, inputs, train=train)
        return shift, log_scale

    def forward(self, variables, x, u=None, train=False):
        means, log_stds = self._couple(variables, x, train)
        z = (x - means) * jnp.exp(-log_stds)
        return z, -jnp.sum(log_stds, axis=-1), variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        x = jnp.zeros_like(z)
        log_stds = jnp.zeros_like(z)
        for dim in range(self.d):
            means, log_stds = self._couple(variables, x, train)
            x = x.at[:, dim].set(z[:, dim] * jnp.exp(log_stds[:, dim]) + means[:, dim])
        return x, jnp.sum(log_stds, axis=-1)
