"""BijectionMixtureDensity — logsumexp mixture over K bijections sharing one
prior (reference exact.py:50-106; not produced by the factory, kept for API
parity and experimentation)."""

import jax
import jax.numpy as jnp

from .base import Density


class BijectionMixtureDensity(Density):
    def __init__(self, prior, bijections, weight_map):
        assert bijections, "Must have at least one bijection"
        self.prior = prior
        self.bijections = list(bijections)
        self.weight_map = weight_map  # net: z_flat -> (B, K) logits

    def init(self, key):
        kp, kw, *kb = jax.random.split(key, 2 + len(self.bijections))
        pv = self.prior.init(kp)
        wv = self.weight_map.init(kw)
        bvs = [b.init(k) for b, k in zip(self.bijections, kb)]
        return {
            "params": {
                "prior": pv["params"],
                "weight_map": wv["params"],
                "bijections": [v["params"] for v in bvs],
            },
            "state": {
                "prior": pv["state"],
                "weight_map": wv["state"],
                "bijections": [v["state"] for v in bvs],
            },
        }

    def _child(self, variables, key, i=None):
        p, s = variables["params"][key], variables["state"][key]
        if i is not None:
            p, s = p[i], s[i]
        return {"params": p, "state": s}

    def elbo(self, variables, x, rng=None, train=False, **kw):
        K = len(self.bijections)
        pv = self._child(variables, "prior")
        wv = self._child(variables, "weight_map")

        terms = []
        for i, b in enumerate(self.bijections):
            bv = self._child(variables, "bijections", i)
            z, log_jac, _ = b.forward(bv, x, train=train)
            prior_info, _ = self.prior.elbo(pv, z, rng=rng, train=train)
            logits, _ = self.weight_map.apply(wv, z.reshape(z.shape[0], -1), train=train)
            log_w = jax.nn.log_softmax(logits, axis=-1)[:, i]
            terms.append(log_jac + prior_info["elbo"] + log_w)
        elbo = jax.scipy.special.logsumexp(jnp.stack(terms, 0), axis=0)
        return {"elbo": elbo}, variables["state"]

    def sample(self, variables, rng, num_samples):
        pv = self._child(variables, "prior")
        wv = self._child(variables, "weight_map")
        r1, r2 = jax.random.split(rng)
        z = self.prior.sample(pv, r1, num_samples)
        logits, _ = self.weight_map.apply(wv, z.reshape(num_samples, -1), train=False)
        ks = jax.random.categorical(r2, logits, axis=-1)
        xs = []
        for i, b in enumerate(self.bijections):
            bv = self._child(variables, "bijections", i)
            xi, _ = b.inverse(bv, z, train=False)
            xs.append(xi)
        stacked = jnp.stack(xs, 0)  # (K, B, ...)
        return jnp.take_along_axis(
            stacked, ks[None, :, *([None] * (stacked.ndim - 2))], axis=0
        )[0]
