"""Diagonal Gaussian densities (reference gaussian.py:9-135)."""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Density


def diagonal_gaussian_log_prob(w, means, stddevs):
    """Closed-form diagonal Gaussian log density (gaussian.py:9-22),
    returns (B,)."""
    flat_w = w.reshape(w.shape[0], -1)
    flat_means = means.reshape(means.shape[0], -1)
    flat_vars = stddevs.reshape(stddevs.shape[0], -1) ** 2
    dim = flat_w.shape[1]
    const = -0.5 * dim * np.log(2 * np.pi)
    log_det = -0.5 * jnp.sum(jnp.log(flat_vars), axis=1)
    quad = -0.5 * jnp.sum((flat_w - flat_means) ** 2 / flat_vars, axis=1)
    return const + log_det + quad


def diagonal_gaussian_sample(rng, means, stddevs):
    """Reparameterised sample + its log-prob (gaussian.py:25-36)."""
    epsilon = jax.random.normal(rng, means.shape, dtype=means.dtype)
    samples = stddevs * epsilon + means
    flat_eps = epsilon.reshape(epsilon.shape[0], -1)
    flat_std = stddevs.reshape(stddevs.shape[0], -1)
    dim = flat_eps.shape[1]
    eps_lp = -0.5 * dim * np.log(2 * np.pi) - 0.5 * jnp.sum(flat_eps**2, axis=1)
    log_probs = -jnp.sum(jnp.log(flat_std), axis=1) + eps_lp
    return samples, log_probs


def diagonal_gaussian_entropy(stddevs):
    flat_std = stddevs.reshape(stddevs.shape[0], -1)
    dim = flat_std.shape[1]
    return jnp.sum(jnp.log(flat_std), axis=1) + 0.5 * dim * (1 + np.log(2 * np.pi))


class DiagonalGaussianDensity(Density):
    """Fixed-parameter diagonal Gaussian with an optional buffer of fixed
    samples for stable visualisation grids (gaussian.py:44-87,
    num_fixed_samples=64 from factory.py:200-205)."""

    def __init__(self, shape, num_fixed_samples=0):
        self.shape = tuple(shape)
        self.num_fixed_samples = num_fixed_samples

    def init(self, key):
        state = {}
        if self.num_fixed_samples > 0:
            state["fixed_samples"] = jax.random.normal(
                key, (self.num_fixed_samples, *self.shape)
            )
        return {"params": {}, "state": state}

    def elbo(self, variables, x, rng=None, train=False, **kw):
        mean = jnp.zeros((1,) + self.shape, x.dtype)
        std = jnp.ones((1,) + self.shape, x.dtype)
        lp = diagonal_gaussian_log_prob(
            x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)
        )
        return {"elbo": lp, "z": x}, variables["state"]

    def sample(self, variables, rng, num_samples):
        return jax.random.normal(rng, (num_samples, *self.shape))

    def fixed_sample(self, variables, noise=None):
        if noise is not None:
            return noise
        return variables["state"]["fixed_samples"]

    def extract_latent(self, variables, x, earliest=False):
        return x


class DiagonalGaussianConditionalDensity:
    """q(u|x)/p(u|z) driven by a coupler (gaussian.py:90-135). Not a Density —
    a conditional distribution with log_prob/sample/entropy."""

    def __init__(self, coupler):
        self.coupler = coupler

    def init(self, key):
        return self.coupler.init(key)

    def _means_and_stddevs(self, variables, cond_inputs, train):
        shift, log_scale, _ = self.coupler.apply(variables, cond_inputs, train=train)
        return shift, jnp.exp(log_scale)

    def log_prob(self, variables, inputs, cond_inputs, train=False):
        means, stddevs = self._means_and_stddevs(variables, cond_inputs, train)
        return diagonal_gaussian_log_prob(inputs, means, stddevs)

    def sample(self, variables, rng, cond_inputs, train=False):
        means, stddevs = self._means_and_stddevs(variables, cond_inputs, train)
        return diagonal_gaussian_sample(rng, means, stddevs)

    def entropy(self, variables, cond_inputs, train=False):
        _, stddevs = self._means_and_stddevs(variables, cond_inputs, train)
        return diagonal_gaussian_entropy(stddevs)
