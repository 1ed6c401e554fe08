"""Sum-of-squares polynomial autoregressive flow (Jaini et al. 2019).

Replaces the reference's pyro dependency (reference sos.py:5-35;
SURVEY.md §2.12). Forward-only bijection:

  z_i = c + Σ_k ∫₀^{x_i} (Σ_{l=0}^r a_{ikl} u^l)² du
      = c + Σ_k Σ_{l,m} a_{ikl} a_{ikm} x_i^{l+m+1} / (l+m+1)

with coefficients a_{ik·} produced by an autoregressive MLP on x_{<i}.
log|det| = Σ_i log Σ_k (Σ_l a_{ikl} x_i^l)², guaranteed positive — the
transform is monotone by construction.
"""

import jax
import jax.numpy as jnp

from .base import Bijection
from ..nets import AutoregressiveMLP


class SumOfSquaresPolynomialBijection(Bijection):
    def __init__(self, num_input_channels, hidden_channels, activation, num_polynomials, polynomial_degree):
        shape = (num_input_channels,)
        super().__init__(x_shape=shape, z_shape=shape)
        self.d = num_input_channels
        self.K = num_polynomials
        self.r = polynomial_degree
        self.net = AutoregressiveMLP(
            n_in=num_input_channels,
            hidden=hidden_channels,
            num_output_heads=(polynomial_degree + 1) * num_polynomials,
            activation=activation,
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        nv = self.net.init(k1)
        return {
            "params": {"net": nv["params"], "c": jnp.zeros(())},
            "state": {"net": nv["state"]},
        }

    def forward(self, variables, x, u=None, train=False):
        nv = {"params": variables["params"]["net"], "state": variables["state"]["net"]}
        coeffs, _ = self.net.apply(nv, x, train=train)  # (B, K*(r+1), d)
        B = x.shape[0]
        a = coeffs.reshape(B, self.K, self.r + 1, self.d)
        a = jnp.moveaxis(a, -1, 1)  # (B, d, K, r+1)

        # Powers x^0..x^r: (B, d, r+1)
        exponents = jnp.arange(self.r + 1)
        xp = x[..., None] ** exponents

        # Polynomial values p_k(x_i) = Σ_l a_ikl x_i^l → (B, d, K)
        poly = jnp.einsum("bdkl,bdl->bdk", a, xp)
        log_jac = jnp.sum(jnp.log(jnp.sum(poly**2, axis=-1) + 1e-12), axis=-1)

        # Integral: Σ_k Σ_{l,m} a_l a_m x^{l+m+1}/(l+m+1)
        lm = exponents[:, None] + exponents[None, :] + 1  # (r+1, r+1)
        x_pow = x[..., None, None] ** lm  # (B, d, r+1, r+1)
        outer = jnp.einsum("bdkl,bdkm->bdlm", a, a)
        integral = jnp.sum(outer * x_pow / lm, axis=(-2, -1))
        z = variables["params"]["c"] + integral
        return z, log_jac, variables["state"]

    def inverse(self, variables, z, u=None, train=False):
        raise NotImplementedError("SOS polynomial flows have no analytic inverse")
