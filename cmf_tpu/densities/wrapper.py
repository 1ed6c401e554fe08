"""Wrapper densities (reference wrapper.py).

* DequantizationDensity adds U[0,1) noise to the input before the wrapped elbo
  (wrapper.py:29-30; the torch version mutates in place, here it is pure).
* PassthroughBeforeEvalDensity replays a stored data batch through a training
  forward before evaluation so momentum==1 batch-norm layers snapshot fresh
  statistics (wrapper.py:33-49). Functionally: ``refresh_state`` returns the
  updated state to use for eval.
* DataParallelDensity has no equivalent — parallelism is a mesh sharding
  concern of the train step (SURVEY.md §2.18), not a model-tree node.
"""

import jax

from .base import Density, merge_vars, split_vars


class WrapperDensity(Density):
    def __init__(self, density):
        self.density = density

    def init(self, key):
        return merge_vars(density=self.density.init(key))

    def _v(self, variables):
        (dv,) = split_vars(variables, "density")
        return dv

    def elbo(self, variables, x, rng=None, train=False, **kw):
        info, dstate = self.density.elbo(self._v(variables), x, rng=rng, train=train, **kw)
        return info, {"density": dstate}

    def sample(self, variables, rng, num_samples):
        return self.density.sample(self._v(variables), rng, num_samples)

    def fixed_sample(self, variables, noise=None):
        return self.density.fixed_sample(self._v(variables), noise=noise)

    def decode(self, variables, u, train=False):
        return self.density.decode(self._v(variables), u, train=train)

    def extract_latent(self, variables, x, earliest=False):
        return self.density.extract_latent(self._v(variables), x, earliest=earliest)

    def ood(self, variables, x, rng=None):
        return self.density.ood(self._v(variables), x, rng=rng)


class DequantizationDensity(WrapperDensity):
    def elbo(self, variables, x, rng=None, train=False, **kw):
        rng_deq, rng_rest = jax.random.split(rng)
        noise = jax.random.uniform(rng_deq, x.shape, dtype=x.dtype)
        return super().elbo(variables, x + noise, rng=rng_rest, train=train, **kw)


class PassthroughBeforeEvalDensity(WrapperDensity):
    """Holds a stored batch of training data in state; ``refresh_state`` runs
    a training-mode elbo over it and returns the refreshed state pytree."""

    def __init__(self, density, num_points):
        super().__init__(density)
        self.num_points = num_points

    def attach_data(self, variables, x):
        variables["state"]["passthrough_x"] = x
        return variables

    def init(self, key):
        v = super().init(key)
        # Data is attached after init (needs the training set): attach_data().
        return v

    def refresh_state(self, variables, rng=None):
        x = variables["state"]["passthrough_x"]
        _, dstate = self.density.elbo(self._v(variables), x, rng=rng, train=True)
        new_state = dict(variables["state"])
        new_state["density"] = dstate
        return new_state
