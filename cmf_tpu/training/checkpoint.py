"""Checkpoint pytree (de)hydration.

Contract: reference trainer.py:362-400 — checkpoint carries epoch, iteration,
model state, per-optimizer states, early-stopping bookkeeping. TPU additions:
the PRNG key and the functional model state are explicit entries (the torch
version hides batch-norm stats inside module state_dict).

Arrays are converted to host numpy before pickling so checkpoints are
device-independent and loadable on any topology.
"""

import jax
import numpy as np


def to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


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
