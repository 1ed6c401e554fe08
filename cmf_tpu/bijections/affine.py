"""Affine and conditionally-affine bijections (reference affine.py:10-70)."""

import numpy as np
import jax.numpy as jnp

from .base import Bijection


class AffineBijection(Bijection):
    """z = x·exp(s) + t with learned per-channel or full-shape s, t.

    Reference: affine.py:10-38 (note the x·scale+shift parameterisation,
    opposite order to the couplings).
    """

    def __init__(self, x_shape, per_channel):
        super().__init__(x_shape=x_shape, z_shape=x_shape)
        if per_channel:
            self.param_shape = (x_shape[0],) + (1,) * (len(x_shape) - 1)
            self.log_jac_factor = float(np.prod(x_shape[1:]))
        else:
            self.param_shape = tuple(x_shape)
            self.log_jac_factor = 1.0

    def init(self, key):
        return {
            "params": {
                "shift": jnp.zeros(self.param_shape),
                "log_scale": jnp.zeros(self.param_shape),
            },
            "state": {},
        }

    def _log_jac(self, params, batch_size, dtype):
        lj = self.log_jac_factor * jnp.sum(params["log_scale"])
        return jnp.broadcast_to(lj, (batch_size,)).astype(dtype)

    def forward(self, variables, x, u=None, train=False):
        p = variables["params"]
        z = x * jnp.exp(p["log_scale"]) + p["shift"]
        return z, self._log_jac(p, x.shape[0], x.dtype), variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        p = variables["params"]
        x = (z - p["shift"]) * jnp.exp(-p["log_scale"])
        return x, -self._log_jac(p, z.shape[0], z.dtype)


class ConditionalAffineBijection(Bijection):
    """z = (x + t(u))·exp(s(u)) — the CIF conditional affine layer.

    Reference: affine.py:43-70. ``coupler`` maps u → (shift, log_scale).
    """

    def __init__(self, x_shape, coupler):
        super().__init__(x_shape=x_shape, z_shape=x_shape)
        self.coupler = coupler

    def init(self, key):
        cv = self.coupler.init(key)
        return {"params": {"coupler": cv["params"]}, "state": {"coupler": cv["state"]}}

    def _shift_log_scale(self, variables, u, train):
        cv = {"params": variables["params"]["coupler"], "state": variables["state"]["coupler"]}
        return self.coupler.apply(cv, u, train=train)

    @staticmethod
    def _sum_log_jac(log_scale):
        return jnp.sum(log_scale.reshape(log_scale.shape[0], -1), axis=1)

    def forward(self, variables, x, u=None, train=False):
        shift, log_scale, cstate = self._shift_log_scale(variables, u, train)
        z = (x + shift) * jnp.exp(log_scale)
        return z, self._sum_log_jac(log_scale), {"coupler": cstate}

    def inverse(self, variables, z, u=None, train=False):
        shift, log_scale, _ = self._shift_log_scale(variables, u, train=train)
        x = z * jnp.exp(-log_scale) - shift
        return x, -self._sum_log_jac(log_scale)
