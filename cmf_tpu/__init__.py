"""cmf_tpu — a TPU-native framework for flow-based density estimation and
manifold learning (Canonical Manifold Flows and friends).

Capability parity target: k-flouris/cmf (NeurIPS 2023, arXiv:2310.12743),
redesigned TPU-first:

* transforms are pure functions over parameter pytrees (no stateful modules);
* the injective-flow decoder Jacobian comes from ``jax.linearize`` on the pure
  decode function, replacing the reference's hand-written per-layer JVP rules
  (reference: cmf/models/components/jvp_layers.py, densities/non_square.py);
* log-det of JᵀJ uses a batched jittered Cholesky or a Hutchinson + batched-CG
  surrogate, both shaped for the MXU (fp32 ``preferred_element_type``);
* data parallelism is a ``jax.sharding.Mesh`` + sharding constraints inside a
  single jitted train step (replacing torch ``nn.DataParallel``).
"""

__version__ = "0.1.0"
