"""SplitDensity — multi-scale factor-out (reference split.py).

elbo: chunk the channel dim in two, sum the two sub-elbos (split.py:15-24).
Non-square sampling/decoding zero-pads the second half (split.py:32-52).
"""

import jax
import jax.numpy as jnp

from .base import Density, merge_vars, split_vars

_CHAIN_KEYS = ("low_dim_x", "low_dim_elbo")


class SplitDensity(Density):
    def __init__(self, density_1, density_2, axis=1, non_square=False):
        self.density_1 = density_1
        self.density_2 = density_2
        self.axis = axis
        self.non_square = non_square

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return merge_vars(density_1=self.density_1.init(k1), density_2=self.density_2.init(k2))

    def elbo(self, variables, x, rng=None, train=False, **kw):
        v1, v2 = split_vars(variables, "density_1", "density_2")
        x1, x2 = jnp.split(x, 2, axis=self.axis)
        r1, r2 = (None, None)
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        info1, s1 = self.density_1.elbo(v1, x1, rng=r1, train=train, **kw)
        info2, s2 = self.density_2.elbo(v2, x2, rng=r2, train=train, **kw)
        info = {"elbo": info1["elbo"] + info2["elbo"]}
        for k in _CHAIN_KEYS:
            if k in info1:
                info[k] = info1[k]
        return info, {"density_1": s1, "density_2": s2}

    def pad_inputs(self, x1):
        return jnp.concatenate([x1, jnp.zeros_like(x1)], axis=self.axis)

    def sample(self, variables, rng, num_samples):
        v1, v2 = split_vars(variables, "density_1", "density_2")
        r1, r2 = jax.random.split(rng)
        x1 = self.density_1.sample(v1, r1, num_samples)
        if self.non_square:
            return self.pad_inputs(x1)
        x2 = self.density_2.sample(v2, r2, num_samples)
        return jnp.concatenate([x1, x2], axis=self.axis)

    def fixed_sample(self, variables, noise=None):
        v1, v2 = split_vars(variables, "density_1", "density_2")
        x1 = self.density_1.fixed_sample(v1, noise=noise)
        if self.non_square:
            return self.pad_inputs(x1)
        x2 = self.density_2.fixed_sample(v2, noise=noise)
        return jnp.concatenate([x1, x2], axis=self.axis)

    def decode(self, variables, u, train=False):
        (v1,) = split_vars(variables, "density_1")
        return self.pad_inputs(self.density_1.decode(v1, u, train=train))

    def extract_latent(self, variables, x, earliest=False):
        (v1,) = split_vars(variables, "density_1")
        x1, _ = jnp.split(x, 2, axis=self.axis)
        return self.density_1.extract_latent(v1, x1, earliest=earliest)
