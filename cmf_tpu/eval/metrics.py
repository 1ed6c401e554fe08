"""Importance-sampled evaluation metrics.

Contract: reference cmf/metrics.py:17-37 —
log p(x) ≈ logsumexp_K(elbo samples) − log K, bits-per-dim, elbo gap.

The reference materialises the K·B repeated batch (metrics.py:19) — at its
test-time K this OOMs long before the model does. Here the K samples run as a
``lax.scan`` with a streaming logsumexp, so peak memory is one (B, D) batch
regardless of K (and each sample gets an independent fold of ``rng``, matching
the reference's per-row noise independence).
"""

import numpy as np
import jax
import jax.numpy as jnp


def metrics(density, variables, x, num_elbo_samples, rng=None, train=False):
    """Returns dict of (B,) arrays: elbo, log-prob, bpd, elbo-gap."""
    batch = x.shape[0]
    dim = int(np.prod(x.shape[1:]))
    K = int(num_elbo_samples)

    def one_sample(k_rng):
        info, _ = density.elbo(variables, x, rng=k_rng, train=train)
        return info["elbo"]  # (B,)

    if rng is None or K == 1:
        # rng=None: the elbo is deterministic, so all K samples coincide and
        # logsumexp − log K collapses to the single value (as in the old
        # repeated-batch formulation).
        e = one_sample(rng)
        elbo, log_prob = e, e
    else:
        keys = jax.random.split(rng, K)

        def body(carry, key):
            running_max, sum_exp, sum_elbo = carry
            e = one_sample(key)
            new_max = jnp.maximum(running_max, e)
            sum_exp = sum_exp * jnp.exp(running_max - new_max) + jnp.exp(e - new_max)
            return (new_max, sum_exp, sum_elbo + e), None

        init = (
            jnp.full((batch,), -jnp.inf, x.dtype),
            jnp.zeros((batch,), x.dtype),
            jnp.zeros((batch,), x.dtype),
        )
        (running_max, sum_exp, sum_elbo), _ = jax.lax.scan(body, init, keys)
        elbo = sum_elbo / K
        log_prob = running_max + jnp.log(sum_exp) - jnp.log(jnp.asarray(K, x.dtype))

    bpd = -log_prob / dim / jnp.log(2.0)
    return {
        "elbo": elbo,
        "log-prob": log_prob,
        "bpd": bpd,
        "elbo-gap": log_prob - elbo,
    }
