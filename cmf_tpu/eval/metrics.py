"""Importance-sampled evaluation metrics.

Contract: reference cmf/metrics.py:17-37 —
log p(x) ≈ logsumexp_K(elbo samples) − log K, bits-per-dim, elbo gap.
"""

import numpy as np
import jax
import jax.numpy as jnp


def metrics(density, variables, x, num_elbo_samples, rng=None, train=False):
    """Returns dict of (B,) arrays: elbo, log-prob, bpd, elbo-gap."""
    batch = x.shape[0]
    dim = int(np.prod(x.shape[1:]))

    x_rep = jnp.repeat(x, num_elbo_samples, axis=0)
    info, _ = density.elbo(variables, x_rep, rng=rng, train=train)
    elbo_samples = info["elbo"].reshape(batch, num_elbo_samples)

    elbo = jnp.mean(elbo_samples, axis=1)
    log_prob = jax.scipy.special.logsumexp(elbo_samples, axis=1) - jnp.log(
        jnp.asarray(num_elbo_samples, x.dtype)
    )
    bpd = -log_prob / dim / jnp.log(2.0)
    return {
        "elbo": elbo,
        "log-prob": log_prob,
        "bpd": bpd,
        "elbo-gap": log_prob - elbo,
    }
