"""Batch-norm bijection with explicit running-stats state.

Reference: cmf/models/components/bijections/batchnorm.py:9-121. Semantics kept:

* training forward normalises by batch stats, optionally detached
  (``detach`` / ignore_batch_effects), and stores them so the decoder replay
  (inverse with ``train=True``) denormalises with the SAME batch statistics
  (batchnorm.py:60-62,79-84,106-121);
* ``momentum == 1`` snapshot mode overwrites the running stats with the batch
  stats (batchnorm.py:47-55) — used with the passthrough-before-eval wrapper;
* log-jac is ``Σ (s − ½log(var+eps))`` times the spatial factor for
  per-channel mode (batchnorm.py:96-104).

The stored batch stats live in ``state["batch_mean"/"batch_var"]``; they are
functional state, threaded out of ``forward`` — the TPU-native replacement for
the reference's ``self.mean = mean`` side effect.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection


class BatchNormBijection(Bijection):
    def __init__(self, x_shape, per_channel, apply_affine, momentum, eps=1e-5, detach=False):
        super().__init__(x_shape=x_shape, z_shape=x_shape)
        assert 0 <= momentum <= 1
        assert eps > 0
        self.momentum = momentum
        self.eps = eps
        self.detach = detach
        self.apply_affine = apply_affine
        if per_channel:
            self.param_shape = (x_shape[0],) + (1,) * (len(x_shape) - 1)
            self.average_axes = (0,) + tuple(range(2, len(x_shape) + 1))
            self.log_jac_factor = float(np.prod(x_shape[1:]))
        else:
            self.param_shape = tuple(x_shape)
            self.average_axes = (0,)
            self.log_jac_factor = 1.0

    def init(self, key):
        params = {}
        if self.apply_affine:
            params = {
                "shift": jnp.zeros(self.param_shape),
                "log_scale": jnp.zeros(self.param_shape),
            }
        zeros = jnp.zeros(self.param_shape)
        ones = jnp.ones(self.param_shape)
        return {
            "params": params,
            "state": {
                "running_mean": zeros,
                "running_var": ones,
                # Batch stats from the most recent training forward — consumed
                # by inverse(train=True) during the decoder replay.
                "batch_mean": zeros,
                "batch_var": ones,
            },
        }

    def _average(self, data):
        return jnp.mean(data, axis=self.average_axes, keepdims=True)[0]

    def _log_jac(self, params, var, batch_size, dtype):
        summands = -0.5 * jnp.log(var + self.eps)
        if self.apply_affine:
            summands = params["log_scale"] + summands
        lj = self.log_jac_factor * jnp.sum(summands)
        return jnp.broadcast_to(lj, (batch_size,)).astype(dtype)

    def forward(self, variables, x, u=None, train=False):
        p, s = variables["params"], variables["state"]
        if train:
            mean = self._average(x)
            var = self._average((x - mean) ** 2)
            if self.detach:
                mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
            if self.momentum == 1:
                running_mean = jax.lax.stop_gradient(mean)
                running_var = jax.lax.stop_gradient(var)
            elif self.momentum > 0:
                running_mean = (1 - self.momentum) * s["running_mean"] + self.momentum * jax.lax.stop_gradient(mean)
                running_var = (1 - self.momentum) * s["running_var"] + self.momentum * jax.lax.stop_gradient(var)
            else:
                running_mean, running_var = s["running_mean"], s["running_var"]
            new_state = {
                "running_mean": running_mean,
                "running_var": running_var,
                "batch_mean": mean,
                "batch_var": var,
            }
        else:
            mean, var = s["running_mean"], s["running_var"]
            new_state = s

        z = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.apply_affine:
            z = z * jnp.exp(p["log_scale"]) + p["shift"]
        return z, self._log_jac(p, var, x.shape[0], x.dtype), new_state

    def inverse(self, variables, z, u=None, train=False):
        p, s = variables["params"], variables["state"]
        if self.apply_affine:
            z = (z - p["shift"]) * jnp.exp(-p["log_scale"])
        if train:
            mean, var = s["batch_mean"], s["batch_var"]
        else:
            mean, var = s["running_mean"], s["running_var"]
        x = z * jnp.sqrt(var + self.eps) + mean
        return x, -self._log_jac(p, var, z.shape[0], z.dtype)
