"""Affine coupling layers (RealNVP-style ACLs).

Reference: cmf/models/components/bijections/acl.py. Transform convention
(acl.py:43-46): on the modified half, z = (x + t)·exp(s); inverse
x = z·exp(−s) − t. Log-jac is Σ s over modified elements.

Four maskings, matching the factory (factory.py:358-396):
  * Checkerboard2d — spatial (i+j) parity mask over NCHW images;
  * SplitChannelwise — first half of channels passes through;
  * AlternatingChannelwise — even/odd channel interleave;
  * MaskedChannelwise — generic boolean channel mask.

The coupler sees the passthrough part (concatenated with the CIF ``u`` when
present, acl.py:12-16). No hand-written ``_jvp`` is needed: the decoder
pushforward comes from ``jax.jvp`` of ``inverse`` (SURVEY.md §7).
"""

import numpy as np
import jax.numpy as jnp

from .base import Bijection


class _CouplingBase(Bijection):
    def __init__(self, x_shape, coupler):
        super().__init__(x_shape=x_shape, z_shape=x_shape)
        self.coupler = coupler

    def init(self, key):
        cv = self.coupler.init(key)
        return {"params": {"coupler": cv["params"]}, "state": {"coupler": cv["state"]}}

    def _couple(self, variables, inputs, u, train):
        if u is not None:
            inputs = jnp.concatenate([inputs, u], axis=1)
        cv = {"params": variables["params"]["coupler"], "state": variables["state"]["coupler"]}
        return self.coupler.apply(cv, inputs, train=train)

    @staticmethod
    def _sum_log_jac(log_scale):
        return jnp.sum(log_scale.reshape(log_scale.shape[0], -1), axis=1)


class Checkerboard2dCouplingBijection(_CouplingBase):
    """Spatial checkerboard mask (acl.py:29-78). mask==1 passes through."""

    def __init__(self, x_shape, coupler, reverse_mask):
        super().__init__(x_shape=x_shape, coupler=coupler)
        assert len(x_shape) == 3
        _, h, w = x_shape
        ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        mask = ((ii + jj) % 2 == 1).astype(np.float32)
        if reverse_mask:
            mask = 1.0 - mask
        self.mask = jnp.asarray(mask)[None, None]  # (1,1,H,W), broadcast over C

    def forward(self, variables, x, u=None, train=False):
        m = self.mask
        shift, log_scale, cstate = self._couple(variables, m * x, u, train)
        z = m * x + (1 - m) * ((x + shift) * jnp.exp(log_scale))
        lj = self._sum_log_jac((1 - m) * log_scale)
        return z, lj, {"coupler": cstate}

    def inverse(self, variables, z, u=None, train=False):
        m = self.mask
        shift, log_scale, _ = self._couple(variables, m * z, u, train)
        x = m * z + (1 - m) * (z * jnp.exp(-log_scale) - shift)
        return x, -self._sum_log_jac((1 - m) * log_scale)


class _ChannelwiseCouplingBijection(_CouplingBase):
    """Channel split coupling base (acl.py:82-160): the coupler acts on the
    passthrough channels and shifts/scales all modified channels."""

    def forward(self, variables, x, u=None, train=False):
        passthrough, modified = self._split(x)
        shift, log_scale, cstate = self._couple(variables, passthrough, u, train)
        z = self._combine(passthrough, (modified + shift) * jnp.exp(log_scale))
        return z, self._sum_log_jac(log_scale), {"coupler": cstate}

    def inverse(self, variables, z, u=None, train=False):
        passthrough, modified = self._split(z)
        shift, log_scale, _ = self._couple(variables, passthrough, u, train)
        x = self._combine(passthrough, modified * jnp.exp(-log_scale) - shift)
        return x, -self._sum_log_jac(log_scale)

    def _split(self, x):
        raise NotImplementedError

    def _combine(self, passthrough, modified):
        raise NotImplementedError


class SplitChannelwiseCouplingBijection(_ChannelwiseCouplingBijection):
    """First (or last, if reverse_mask) half of channels passes through
    (acl.py:169-189)."""

    def __init__(self, x_shape, coupler_factory, reverse_mask):
        num_channels = x_shape[0]
        num_passthrough = num_channels // 2
        if reverse_mask:
            num_passthrough = num_channels - num_passthrough
        assert num_passthrough > 0, "Not a bijection without passthrough"
        super().__init__(x_shape=x_shape, coupler=coupler_factory(num_passthrough))
        self.num_passthrough = num_passthrough
        self.reverse_mask = reverse_mask

    def _split(self, x):
        if self.reverse_mask:
            return x[:, x.shape[1] - self.num_passthrough :], x[:, : x.shape[1] - self.num_passthrough]
        return x[:, : self.num_passthrough], x[:, self.num_passthrough :]

    def _combine(self, passthrough, modified):
        if self.reverse_mask:
            return jnp.concatenate([modified, passthrough], axis=1)
        return jnp.concatenate([passthrough, modified], axis=1)


class AlternatingChannelwiseCouplingBijection(_ChannelwiseCouplingBijection):
    """Even channels pass through (odd when reverse_mask) — acl.py:192-214."""

    def __init__(self, x_shape, coupler_factory, reverse_mask):
        num_channels = x_shape[0]
        pass_idx = np.arange(1 if reverse_mask else 0, num_channels, 2)
        mod_idx = np.arange(0 if reverse_mask else 1, num_channels, 2)
        assert pass_idx.size > 0, "Not a bijection without passthrough"
        super().__init__(x_shape=x_shape, coupler=coupler_factory(int(pass_idx.size)))
        self.pass_idx = jnp.asarray(pass_idx)
        self.mod_idx = jnp.asarray(mod_idx)
        inv = np.argsort(np.concatenate([pass_idx, mod_idx]))
        self.inv_perm = jnp.asarray(inv)

    def _split(self, x):
        return x[:, self.pass_idx], x[:, self.mod_idx]

    def _combine(self, passthrough, modified):
        return jnp.concatenate([passthrough, modified], axis=1)[:, self.inv_perm]


class MaskedChannelwiseCouplingBijection(_ChannelwiseCouplingBijection):
    """Generic boolean channel mask (acl.py:218-243); mask True passes."""

    def __init__(self, x_shape, coupler_factory, mask):
        mask = np.asarray(mask, dtype=bool)
        assert mask.shape == (x_shape[0],)
        assert mask.any(), "Not a bijection without passthrough"
        super().__init__(x_shape=x_shape, coupler=coupler_factory(int(mask.sum())))
        pass_idx = np.nonzero(mask)[0]
        mod_idx = np.nonzero(~mask)[0]
        self.pass_idx = jnp.asarray(pass_idx)
        self.mod_idx = jnp.asarray(mod_idx)
        self.inv_perm = jnp.asarray(np.argsort(np.concatenate([pass_idx, mod_idx])))

    def _split(self, x):
        return x[:, self.pass_idx], x[:, self.mod_idx]

    def _combine(self, passthrough, modified):
        return jnp.concatenate([passthrough, modified], axis=1)[:, self.inv_perm]
