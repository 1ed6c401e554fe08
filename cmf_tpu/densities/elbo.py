"""ELBODensity — continuously-indexed flows (CIFs), reference elbo.py:6-60.

elbo(x) = log-jac + log p(u|z) − log q(u|x) + prior_elbo(z), with
u ~ q(·|x) reparameterised, and the bijection conditioned on u.
"""

import jax

from .base import Density, merge_vars, split_vars


class ELBODensity(Density):
    def __init__(self, prior, p_u_density, bijection, q_u_density):
        self.prior = prior
        self.p_u_density = p_u_density
        self.bijection = bijection
        self.q_u_density = q_u_density

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return merge_vars(
            prior=self.prior.init(k1),
            p_u=self.p_u_density.init(k2),
            bijection=self.bijection.init(k3),
            q_u=self.q_u_density.init(k4),
        )

    def elbo(self, variables, x, rng=None, train=False, **kw):
        pv, puv, bv, quv = split_vars(variables, "prior", "p_u", "bijection", "q_u")
        rng_u, rng_prior = jax.random.split(rng)
        u, log_q_u = self.q_u_density.sample(quv, rng_u, x, train=train)
        z, log_jac, bstate = self.bijection.forward(bv, x, u=u, train=train)
        log_p_u = self.p_u_density.log_prob(puv, u, z, train=train)
        prior_info, pstate = self.prior.elbo(pv, z, rng=rng_prior, train=train, **kw)
        info = {"elbo": log_jac + log_p_u - log_q_u + prior_info["elbo"]}
        return info, {
            "prior": pstate,
            "p_u": puv["state"],
            "bijection": bstate,
            "q_u": quv["state"],
        }

    def sample(self, variables, rng, num_samples):
        pv, puv, bv, _ = split_vars(variables, "prior", "p_u", "bijection", "q_u")
        r1, r2 = jax.random.split(rng)
        z = self.prior.sample(pv, r1, num_samples)
        u, _ = self.p_u_density.sample(puv, r2, z, train=False)
        x, _ = self.bijection.inverse(bv, z, u=u, train=False)
        return x

    def fixed_sample(self, variables, noise=None):
        pv, puv, bv, _ = split_vars(variables, "prior", "p_u", "bijection", "q_u")
        z = self.prior.fixed_sample(pv, noise=noise)
        # Deterministic u = p-mean for fixed samples: use the coupler's mean.
        means, _ = self.p_u_density._means_and_stddevs(puv, z, train=False)
        x, _ = self.bijection.inverse(bv, z, u=means, train=False)
        return x

    def extract_latent(self, variables, x, earliest=False):
        pv, _, bv, quv = split_vars(variables, "prior", "p_u", "bijection", "q_u")
        means, _ = self.q_u_density._means_and_stddevs(quv, x, train=False)
        z, _, _ = self.bijection.forward(bv, x, u=means, train=False)
        return self.prior.extract_latent(pv, z, earliest=earliest)
