"""BijectionDensity: density through an exact bijection (reference exact.py).

elbo(x) = prior_elbo(bij(x)) + log|det ∂z/∂x| (exact.py:23-30); sampling maps
prior samples back through the inverse (exact.py:32-34). Non-square chain
keys ("low_dim_x", "low_dim_elbo") bubble up from the prior, and ``decode`` is
``bij⁻¹ ∘ prior.decode`` — the pure-function replacement for the reference's
transform_stack replay (non_square.py:146-188,313-321).
"""

import jax

from .base import Density, merge_vars, split_vars

_CHAIN_KEYS = ("low_dim_x", "low_dim_elbo")


class BijectionDensity(Density):
    def __init__(self, bijection, prior):
        self.bijection = bijection
        self.prior = prior

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return merge_vars(bijection=self.bijection.init(k1), prior=self.prior.init(k2))

    def elbo(self, variables, x, rng=None, train=False, **kw):
        bv, pv = split_vars(variables, "bijection", "prior")
        z, log_jac, bstate = self.bijection.forward(bv, x, train=train)
        prior_info, pstate = self.prior.elbo(pv, z, rng=rng, train=train, **kw)
        info = {"elbo": prior_info["elbo"] + log_jac}
        for k in _CHAIN_KEYS:
            if k in prior_info:
                info[k] = prior_info[k]
        return info, {"bijection": bstate, "prior": pstate}

    def sample(self, variables, rng, num_samples):
        bv, pv = split_vars(variables, "bijection", "prior")
        z = self.prior.sample(pv, rng, num_samples)
        x, _ = self.bijection.inverse(bv, z, train=False)
        return x

    def fixed_sample(self, variables, noise=None):
        bv, pv = split_vars(variables, "bijection", "prior")
        z = self.prior.fixed_sample(pv, noise=noise)
        x, _ = self.bijection.inverse(bv, z, train=False)
        return x

    def decode(self, variables, u, train=False):
        bv, pv = split_vars(variables, "bijection", "prior")
        z = self.prior.decode(pv, u, train=train)
        return self.bijection.inverse_point(bv, z, train=train)

    def extract_latent(self, variables, x, earliest=False):
        bv, pv = split_vars(variables, "bijection", "prior")
        z, _, _ = self.bijection.forward(bv, x, train=False)
        return self.prior.extract_latent(pv, z, earliest=earliest)

    def ood(self, variables, x, rng=None):
        bv, pv = split_vars(variables, "bijection", "prior")
        z, _, _ = self.bijection.forward(bv, x, train=False)
        return self.prior.ood(pv, z, rng=rng)
