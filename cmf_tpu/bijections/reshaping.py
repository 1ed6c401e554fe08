"""Volume-preserving reshaping bijections.

Reference: cmf/models/components/bijections/reshaping.py:8-115 —
random channel permutation, flip, view (flatten), glow squeeze.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection


class _ReshapingBijection(Bijection):
    def __init__(self, x_shape, z_shape):
        assert int(np.prod(x_shape)) == int(np.prod(z_shape))
        super().__init__(x_shape=x_shape, z_shape=z_shape)

    def forward(self, variables, x, u=None, train=False):
        return self._reshape_x(variables, x), jnp.zeros(x.shape[0], x.dtype), variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        return self._reshape_z(variables, z), jnp.zeros(z.shape[0], z.dtype)

    def _reshape_x(self, variables, x):
        raise NotImplementedError

    def _reshape_z(self, variables, z):
        raise NotImplementedError


class RandomChannelwisePermutationBijection(_ReshapingBijection):
    """Fixed random channel permutation, seeded at init
    (reshaping.py:32-43; the permutation is a buffer, i.e. state)."""

    def __init__(self, x_shape):
        super().__init__(x_shape=x_shape, z_shape=x_shape)

    def init(self, key):
        perm = jax.random.permutation(key, self.x_shape[0])
        return {
            "params": {},
            "state": {"permutation": perm, "inverse_permutation": jnp.argsort(perm)},
        }

    def _reshape_x(self, variables, x):
        return x[:, variables["state"]["permutation"]]

    def _reshape_z(self, variables, z):
        return z[:, variables["state"]["inverse_permutation"]]


class FlipBijection(_ReshapingBijection):
    """Reverse along the channel dim (reshaping.py:46-57)."""

    def __init__(self, x_shape, axis=1):
        super().__init__(x_shape=x_shape, z_shape=x_shape)
        self.axis = axis

    def _reshape_x(self, variables, x):
        return jnp.flip(x, axis=self.axis)

    def _reshape_z(self, variables, z):
        return jnp.flip(z, axis=self.axis)


class ViewBijection(_ReshapingBijection):
    """Reshape, typically flatten (reshaping.py:60-66)."""

    def _reshape_x(self, variables, x):
        return x.reshape(x.shape[0], *self.z_shape)

    def _reshape_z(self, variables, z):
        return z.reshape(z.shape[0], *self.x_shape)


class Squeeze2dBijection(_ReshapingBijection):
    """Glow space-to-depth squeeze (reshaping.py:69-115): (C,H,W) →
    (C·f², H/f, W/f) with the (c, fh, fw) ordering of the torch original."""

    def __init__(self, x_shape, factor):
        assert len(x_shape) == 3
        c, h, w = x_shape
        assert h % factor == 0 and w % factor == 0
        self.factor = factor
        super().__init__(
            x_shape=x_shape, z_shape=(c * factor**2, h // factor, w // factor)
        )

    def _reshape_x(self, variables, x):
        b = x.shape[0]
        c, h, w = self.x_shape
        f = self.factor
        z = x.reshape(b, c, h // f, f, w // f, f)
        z = z.transpose(0, 1, 3, 5, 2, 4)
        return z.reshape(b, *self.z_shape)

    def _reshape_z(self, variables, z):
        b = z.shape[0]
        zc, zh, zw = self.z_shape
        f = self.factor
        x = z.reshape(b, zc // f**2, f, f, zh, zw)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, *self.x_shape)
