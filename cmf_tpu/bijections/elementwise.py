"""Elementwise bijections: logit, tanh, scalar multiply/add.

Reference: cmf/models/components/bijections/math.py:9-105. The reference's
TanhBijection._log_dF references an undefined variable (math.py:67-68, a
latent bug — tanh is never used by factory schemas); here it is implemented
correctly: log tanh'(x) = 2·(log 2 − x − softplus(−2x)).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection


class _ElementwiseBijection(Bijection):
    def __init__(self, x_shape):
        super().__init__(x_shape=x_shape, z_shape=x_shape)

    def forward(self, variables, x, u=None, train=False):
        z = self._f(x)
        lj = jnp.sum(self._log_df(x).reshape(x.shape[0], -1), axis=1)
        return z, lj, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        # NOTE: the reference evaluates −log dF at the codomain argument
        # (math.py:28-29), which is incorrect for non-linear maps; here the
        # inverse log-jac is evaluated at the reconstructed domain point.
        x = self._f_inv(z)
        lj = -jnp.sum(self._log_df(x).reshape(x.shape[0], -1), axis=1)
        return x, lj


class LogitBijection(_ElementwiseBijection):
    _EPS = 1e-7

    def _f(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def _f_inv(self, z):
        return jax.nn.sigmoid(z)

    def _log_df(self, x):
        xc = jnp.clip(x, self._EPS, 1 - self._EPS)
        return -jnp.log(xc) - jnp.log1p(-xc)


class TanhBijection(_ElementwiseBijection):
    _EPS = 1e-7

    def _f(self, x):
        return jnp.tanh(x)

    def _f_inv(self, z):
        zc = jnp.clip(z, -1 + self._EPS, 1 - self._EPS)
        return jnp.arctanh(zc)

    def _log_df(self, x):
        return 2.0 * (np.log(2.0) - x - jax.nn.softplus(-2.0 * x))


class ScalarMultiplicationBijection(_ElementwiseBijection):
    def __init__(self, x_shape, value):
        assert np.isscalar(value) and value != 0.0
        super().__init__(x_shape=x_shape)
        self.value = float(value)

    def _f(self, x):
        return self.value * x

    def _f_inv(self, z):
        return z / self.value

    def _log_df(self, x):
        return jnp.full_like(x, np.log(abs(self.value)))


class ScalarAdditionBijection(_ElementwiseBijection):
    def __init__(self, x_shape, value):
        assert np.isscalar(value)
        super().__init__(x_shape=x_shape)
        self.value = float(value)

    def _f(self, x):
        return x + self.value

    def _f_inv(self, z):
        return z - self.value

    def _log_df(self, x):
        return jnp.zeros_like(x)
