"""Bijection protocol: pure functions over explicit parameter/state pytrees.

Reference counterpart: cmf/models/components/bijections/bijection.py. The
torch design routes everything through stateful ``nn.Module.forward`` so that
``nn.DataParallel`` can scatter tensors (density.py:8-28); here every transform
is a pure function of ``(variables, x)`` so the whole model jits/shards under
one ``pjit`` and the decoder's JVP falls out of ``jax.jvp`` for free.

Conventions
-----------
* ``variables`` is a dict ``{"params": pytree, "state": pytree}``. ``params``
  are trainable; ``state`` holds buffers (masks, permutations) and batch-norm
  statistics. ``forward`` may return an updated state (batch-norm writes its
  batch statistics there so the decoder replay can reuse them, mirroring
  batchnorm.py:60-62,79-84).
* ``forward``:  x → z. Returns ``(z, log_jac, new_state)`` with log_jac shaped
  (B,). ``inverse``: z → x. Returns ``(x, log_jac)`` and reads (never writes)
  state. ``u`` is the CIF conditioning input (bijection.py kwargs "u").
* Shapes are static attributes ``x_shape`` / ``z_shape`` (no batch dim).
"""

import jax
import jax.numpy as jnp


def _empty():
    return {"params": {}, "state": {}}


class Bijection:
    """Static-configuration object; all tensors live in explicit pytrees."""

    def __init__(self, x_shape, z_shape):
        self.x_shape = tuple(x_shape)
        self.z_shape = tuple(z_shape)

    def init(self, key):
        """Returns {"params": ..., "state": ...}."""
        return _empty()

    def forward(self, variables, x, u=None, train=False):
        raise NotImplementedError

    def inverse(self, variables, z, u=None, train=False):
        raise NotImplementedError

    def inverse_point(self, variables, z, u=None, train=False):
        """z → x without the log-jacobian — the decode fast path.

        Subclasses whose inverse log-det is expensive (splines) override this;
        the default relies on XLA dead-code-eliminating the unused log_jac.
        """
        x, _ = self.inverse(variables, z, u=u, train=train)
        return x

    def inverse_bijection(self):
        return InverseBijection(self)


class InverseBijection(Bijection):
    """Swap forward/inverse (reference bijection.py InverseBijection)."""

    def __init__(self, bijection):
        super().__init__(x_shape=bijection.z_shape, z_shape=bijection.x_shape)
        self.bijection = bijection

    def init(self, key):
        return self.bijection.init(key)

    def forward(self, variables, x, u=None, train=False):
        z, log_jac = self.bijection.inverse(variables, x, u=u, train=train)
        return z, log_jac, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        x, log_jac, _ = self.bijection.forward(variables, z, u=u, train=train)
        return x, log_jac


class IdentityBijection(Bijection):
    def __init__(self, x_shape):
        super().__init__(x_shape=x_shape, z_shape=x_shape)

    def forward(self, variables, x, u=None, train=False):
        return x, jnp.zeros(x.shape[0], x.dtype), variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        return z, jnp.zeros(z.shape[0], z.dtype)


class CompositeBijection(Bijection):
    """Chain of bijections with log-jac accumulation (bijection.py:114-162).

    ``direction="x-to-z"`` means the constituent list maps x to z in order.
    Variables are stored as {"params": {"layers": [..]}, "state": {...}}.
    """

    def __init__(self, bijections, direction="x-to-z"):
        assert direction in ("x-to-z", "z-to-x")
        if direction == "z-to-x":
            bijections = [b.inverse_bijection() for b in reversed(bijections)]
        super().__init__(x_shape=bijections[0].x_shape, z_shape=bijections[-1].z_shape)
        for a, b in zip(bijections[:-1], bijections[1:]):
            assert a.z_shape == b.x_shape, f"shape mismatch {a.z_shape} vs {b.x_shape}"
        self.bijections = list(bijections)

    def init(self, key):
        keys = jax.random.split(key, len(self.bijections))
        layers = [b.init(k) for b, k in zip(self.bijections, keys)]
        return {
            "params": {"layers": [v["params"] for v in layers]},
            "state": {"layers": [v["state"] for v in layers]},
        }

    def _layer_vars(self, variables, i):
        return {
            "params": variables["params"]["layers"][i],
            "state": variables["state"]["layers"][i],
        }

    def forward(self, variables, x, u=None, train=False):
        log_jac = jnp.zeros(x.shape[0], x.dtype)
        new_states = []
        for i, b in enumerate(self.bijections):
            x, lj, st = b.forward(self._layer_vars(variables, i), x, u=u, train=train)
            log_jac = log_jac + lj
            new_states.append(st)
        return x, log_jac, {"layers": new_states}

    def inverse(self, variables, z, u=None, train=False):
        log_jac = jnp.zeros(z.shape[0], z.dtype)
        for i in reversed(range(len(self.bijections))):
            z, lj = self.bijections[i].inverse(self._layer_vars(variables, i), z, u=u, train=train)
            log_jac = log_jac + lj
        return z, log_jac
