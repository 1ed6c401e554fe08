"""ConcreteConditionalDensity — Gumbel-softmax (Concrete) conditional
distribution (reference concrete.py:1-80; not produced by the factory, kept
for capability parity). log-density follows Maddison et al. 2016, eq. (10)."""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


class ConcreteConditionalDensity:
    def __init__(self, log_alpha_map, lam):
        self.log_alpha_map = log_alpha_map  # net: cond -> (B, K) log-alphas
        self.lam = float(lam)

    def init(self, key):
        return self.log_alpha_map.init(key)

    def _log_alphas(self, variables, cond_inputs, train):
        out, _ = self.log_alpha_map.apply(variables, cond_inputs, train=train)
        return out

    def log_prob(self, variables, inputs, cond_inputs, train=False):
        """inputs on the simplex, (B, K)."""
        log_alpha = self._log_alphas(variables, cond_inputs, train)
        k = log_alpha.shape[-1]
        log_x = jnp.log(inputs + 1e-20)
        term1 = gammaln(jnp.asarray(float(k))) + (k - 1) * jnp.log(self.lam)
        term2 = jnp.sum(log_alpha - (self.lam + 1) * log_x, axis=-1)
        term3 = -k * jax.scipy.special.logsumexp(
            log_alpha - self.lam * log_x, axis=-1
        )
        return term1 + term2 + term3

    def sample(self, variables, rng, cond_inputs, train=False):
        log_alpha = self._log_alphas(variables, cond_inputs, train)
        gumbel = jax.random.gumbel(rng, log_alpha.shape, dtype=log_alpha.dtype)
        sample = jax.nn.softmax((log_alpha + gumbel) / self.lam, axis=-1)
        return sample, self.log_prob(variables, sample, cond_inputs, train=train)
