"""Density protocol.

Reference: cmf/models/components/densities/density.py — a string-mode
``forward(mode, *args)`` dispatch that exists purely so ``nn.DataParallel``
can scatter tensor arguments (density.py:8-28). Here densities are plain
static-config objects with pure methods over explicit variable pytrees; the
whole model shards under one jitted train step instead.

Methods (all pure):
  init(key) -> {"params","state"}
  elbo(variables, x, rng, train, **kw) -> (info dict, new_state)
      info always has "elbo" (B,); inside a non-square chain it also carries
      "low_dim_x" and "low_dim_elbo" bubbled up from the tail (replacing the
      reference's side-effectful _traverse_backward, non_square.py:146-188).
  sample(variables, rng, n) -> x
  fixed_sample(variables, noise=None) -> x
  decode(variables, u, train) -> x — the injective decoder g: ℝᵈ→ℝᴰ for the
      non-square chain (replaces flow_forward's mutable transform_stack,
      non_square.py:313-321). Pure ⇒ ``jax.jvp``/``jax.linearize`` give its
      pushforward with no hand-written JVP rules.
  extract_latent(variables, x, earliest) -> latent
  ood(variables, x, rng) -> {"likelihood", "reconstruction-error"}
"""


class Density:
    def init(self, key):
        return {"params": {}, "state": {}}

    def elbo(self, variables, x, rng=None, train=False, **kw):
        raise NotImplementedError

    def sample(self, variables, rng, num_samples):
        raise NotImplementedError

    def fixed_sample(self, variables, noise=None):
        raise NotImplementedError

    def decode(self, variables, u, train=False):
        raise NotImplementedError(f"{type(self).__name__} is not part of a non-square chain")

    def extract_latent(self, variables, x, earliest=False):
        raise NotImplementedError

    def ood(self, variables, x, rng=None):
        raise NotImplementedError


def split_vars(variables, *keys):
    """Project nested variables {"params": {k: ...}, "state": {k: ...}} onto
    child modules by key."""
    out = []
    for k in keys:
        out.append({"params": variables["params"][k], "state": variables["state"][k]})
    return tuple(out)


def merge_vars(**children):
    return {
        "params": {k: v["params"] for k, v in children.items()},
        "state": {k: v["state"] for k, v in children.items()},
    }
