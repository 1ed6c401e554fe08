"""Checkpoint pytree (de)hydration.

Contract: reference trainer.py:362-400 — checkpoint carries epoch, iteration,
model state, per-optimizer states, early-stopping bookkeeping. TPU additions:
the PRNG key and the functional model state are explicit entries (the torch
version hides batch-norm stats inside module state_dict).

Arrays are converted to host numpy before pickling so checkpoints are
device-independent and loadable on any topology.
"""

import jax
import jax.numpy as jnp
import numpy as np


def to_host(tree):
    """Device→host a pytree with ONE packed transfer per dtype.

    Fetching leaves individually pays per-transfer latency for every leaf
    (~100 leaves/checkpoint; painful over remote-device tunnels and at pod
    scale). Leaves are concatenated on device per dtype, transferred once,
    and split on host.
    """
    leaves, treedef = jax.tree.flatten(tree)
    out = [None] * len(leaves)

    by_dtype = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            by_dtype.setdefault(jnp.asarray(leaf).dtype, []).append(i)
        else:
            out[i] = leaf

    for dtype, idxs in by_dtype.items():
        packed = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs]) if len(idxs) > 1 else jnp.ravel(leaves[idxs[0]])
        host = np.asarray(packed)
        offset = 0
        for i in idxs:
            shape = leaves[i].shape
            size = int(np.prod(shape)) if shape else 1
            out[i] = host[offset : offset + size].reshape(shape)
            offset += size

    return jax.tree.unflatten(treedef, out)


def make_checkpoint(epoch, iteration, params, model_state, opt_states,
                    best_valid_loss, num_bad_valid_epochs, rng):
    return {
        "epoch": int(epoch),
        "iteration": int(iteration),
        "params": to_host(params),
        "model_state": to_host(model_state),
        "opt_states": to_host(opt_states),
        "best_valid_loss": float(best_valid_loss),
        "num_bad_valid_epochs": int(num_bad_valid_epochs),
        "rng": np.asarray(rng),
    }


def restore_arrays(tree):
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)
