"""Linear bijections: LU-parameterised linear map and invertible 1×1 convs.

Reference: invconv.py:10-105 (brute-force slogdet + LU variants, optional
``Wx + Vu`` CIF conditioning) and linear.py:13-36 (nsf LULinear,
identity-initialised — rebuilt from scratch here since the nsf submodule is a
vendored dependency, SURVEY.md §2.12).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .base import Bijection


def _lu_decompose(w):
    """NumPy host-side LU with partial pivoting → (P, L, U) with PLU = w."""
    import scipy.linalg

    p, l, u = scipy.linalg.lu(np.asarray(w))
    return p, l, u


class _Invertible1x1ConvBase(Bijection):
    """W applied across channels of (B,D) or (B,C,H,W) inputs, optionally plus
    V·u conditioning (invconv.py:10-62)."""

    def __init__(self, x_shape, num_u_channels=0):
        assert len(x_shape) in (1, 3)
        super().__init__(x_shape=x_shape, z_shape=x_shape)
        self.num_channels = x_shape[0]
        self.num_u_channels = num_u_channels
        self.num_non_channel_elements = float(np.prod(x_shape[1:]))

    def _apply_channel_matrix(self, inputs, w):
        if len(self.x_shape) == 1:
            return inputs @ w.T
        return jnp.einsum("oc,bchw->bohw", w, inputs)

    def _get_vu(self, variables, u):
        if u is None:
            assert self.num_u_channels == 0
            return 0.0
        return self._apply_channel_matrix(u, variables["params"]["u_weights"])

    def _weights(self, variables):
        raise NotImplementedError

    def _log_jac_single(self, variables):
        raise NotImplementedError

    def forward(self, variables, x, u=None, train=False):
        z = self._apply_channel_matrix(x, self._weights(variables)) + self._get_vu(variables, u)
        lj = jnp.broadcast_to(self._log_jac_single(variables), (x.shape[0],)).astype(x.dtype)
        return z, lj, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        w_inv = jnp.linalg.inv(self._weights(variables))
        x = self._apply_channel_matrix(z - self._get_vu(variables, u), w_inv)
        lj = -jnp.broadcast_to(self._log_jac_single(variables), (z.shape[0],)).astype(z.dtype)
        return x, lj


class BruteForceInvertible1x1ConvBijection(_Invertible1x1ConvBase):
    """Free W, log-jac by slogdet (invconv.py:65-74)."""

    def init(self, key):
        w = jnp.linalg.qr(jax.random.normal(key, (self.num_channels, self.num_channels)))[0]
        params = {"weights": w}
        if self.num_u_channels > 0:
            params["u_weights"] = jnp.zeros((self.num_channels, self.num_u_channels))
        return {"params": params, "state": {}}

    def _weights(self, variables):
        return variables["params"]["weights"]

    def _log_jac_single(self, variables):
        return jnp.linalg.slogdet(variables["params"]["weights"])[1] * self.num_non_channel_elements


class LUInvertible1x1ConvBijection(_Invertible1x1ConvBase):
    """P·L·U parameterised W with fixed P and sign(s) (invconv.py:77-105)."""

    def init(self, key):
        w0 = np.asarray(
            jnp.linalg.qr(jax.random.normal(key, (self.num_channels, self.num_channels)))[0]
        )
        p, l, u = _lu_decompose(w0)
        s = np.diag(u)
        n = self.num_channels
        params = {
            "lower": jnp.asarray(l),
            "log_s": jnp.log(jnp.abs(jnp.asarray(s))),
            "upper": jnp.asarray(np.triu(u, 1)),
            "bias": jnp.zeros(self.x_shape),
        }
        if self.num_u_channels > 0:
            params["u_weights"] = jnp.zeros((self.num_channels, self.num_u_channels))
        state = {
            "P": jnp.asarray(p),
            "sign_s": jnp.asarray(np.sign(s)),
            "l_mask": jnp.asarray(np.tril(np.ones((n, n)), -1)),
        }
        return {"params": params, "state": state}

    def _weights(self, variables):
        p, s = variables["params"], variables["state"]
        n = self.num_channels
        L = p["lower"] * s["l_mask"] + jnp.eye(n)
        U = p["upper"] * s["l_mask"].T + jnp.diag(s["sign_s"] * jnp.exp(p["log_s"]))
        return s["P"] @ L @ U

    def _log_jac_single(self, variables):
        return jnp.sum(variables["params"]["log_s"]) * self.num_non_channel_elements


class LULinearBijection(Bijection):
    """Identity-initialised LU linear over flat inputs — replaces the vendored
    nsf ``LULinear`` (reference linear.py:13-36). Parameterised as
    z = (L·U)x + b with unit-diagonal L and free diagonal U; log-jac is
    Σ log|diag(U)| (softplus-free: identity init keeps the diagonal positive,
    and we take log|·| for safety)."""

    def __init__(self, num_input_channels):
        super().__init__(x_shape=(num_input_channels,), z_shape=(num_input_channels,))
        self.n = num_input_channels

    def init(self, key):
        n = self.n
        # Identity init with a touch of noise off-diagonal, matching nsf's
        # init_identity behaviour (weights ≈ I, bias = 0).
        eps = 1e-3 / np.sqrt(n)
        k1, k2 = jax.random.split(key)
        lower = jax.random.uniform(k1, (n, n), minval=-eps, maxval=eps)
        upper = jax.random.uniform(k2, (n, n), minval=-eps, maxval=eps)
        return {
            "params": {
                "lower": lower,
                "upper": upper,
                "log_diag": jnp.zeros(n),
                "bias": jnp.zeros(n),
            },
            "state": {"l_mask": jnp.asarray(np.tril(np.ones((n, n)), -1))},
        }

    def _lu(self, variables):
        p, s = variables["params"], variables["state"]
        L = p["lower"] * s["l_mask"] + jnp.eye(self.n)
        U = p["upper"] * s["l_mask"].T + jnp.diag(jnp.exp(p["log_diag"]))
        return L, U

    def forward(self, variables, x, u=None, train=False):
        L, U = self._lu(variables)
        z = x @ (L @ U).T + variables["params"]["bias"]
        lj = jnp.broadcast_to(jnp.sum(variables["params"]["log_diag"]), (x.shape[0],)).astype(x.dtype)
        return z, lj, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        L, U = self._lu(variables)
        rhs = (z - variables["params"]["bias"]).T
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        x = jax.scipy.linalg.solve_triangular(U, y, lower=False).T
        lj = -jnp.broadcast_to(jnp.sum(variables["params"]["log_diag"]), (z.shape[0],)).astype(z.dtype)
        return x, lj
