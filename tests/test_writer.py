"""Writer/checkpoint unit tests (reference writer.py semantics)."""

import json
import os
import pickle

import numpy as np
import pytest

from cmf_tpu.training.writer import DummyWriter, Writer
from cmf_tpu.training.checkpoint import make_checkpoint, restore_arrays, to_host


def test_writer_artifacts(tmp_path):
    w = Writer(logdir=str(tmp_path), make_subdir=False, tag_group="sphere", tee=False)
    w.write_scalar("train/loss", 1.5, global_step=10)
    w.write_json("config", {"a": 1})
    w.write_textfile("git-head", "abc123")
    w.write_numpy("ood", np.ones((3, 2)))

    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0] == {"tag": "sphere/train/loss", "value": 1.5, "step": 10}
    assert json.load(open(tmp_path / "config.json")) == {"a": 1}
    assert open(tmp_path / "git-head.txt").read() == "abc123"
    assert np.load(tmp_path / "ood.npy").shape == (3, 2)


def test_checkpoint_atomic_roundtrip(tmp_path):
    w = Writer(logdir=str(tmp_path), make_subdir=False, tee=False)
    data = {"x": np.arange(5), "y": 3}
    w.write_checkpoint("latest", data)
    # atomic: no tmp file left behind
    files = os.listdir(tmp_path / "checkpoints")
    assert files == ["latest.pkl"]
    loaded = w.load_checkpoint("latest")
    np.testing.assert_array_equal(loaded["x"], data["x"])


def test_dummy_writer_noop_but_loads(tmp_path):
    w = Writer(logdir=str(tmp_path), make_subdir=False, tee=False)
    w.write_checkpoint("best_valid", {"v": 7})
    d = DummyWriter(logdir=str(tmp_path))
    d.write_scalar("x", 1.0)  # no-op, no files
    assert d.load_checkpoint("best_valid")["v"] == 7
    with pytest.raises(FileNotFoundError):
        d.load_checkpoint("missing")


def test_make_checkpoint_device_independent(rng):
    import jax
    import jax.numpy as jnp

    params = {"w": jnp.ones((2, 2))}
    ckpt = make_checkpoint(3, 42, params, {}, [{}], 1.5, 2, rng)
    # all leaves must be host numpy (pickle-safe, topology-independent)
    blob = pickle.dumps(ckpt)
    restored = restore_arrays(pickle.loads(blob)["params"])
    assert isinstance(np.asarray(ckpt["params"]["w"]), np.ndarray)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((2, 2)))
    assert ckpt["epoch"] == 3 and ckpt["iteration"] == 42


def test_writer_rundir_timestamped(tmp_path):
    w = Writer(logdir=str(tmp_path), make_subdir=True, rundir_tail="_tag", tee=False)
    assert w.logdir.startswith(str(tmp_path))
    assert w.logdir.endswith("_tag")
    assert os.path.isdir(w.logdir)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend: async array IO + exact pytree structure restore —
    optax namedtuple states must come back as namedtuples (ROADMAP: multihost
    async checkpointing)."""
    import jax.numpy as jnp
    import optax

    opt = optax.adam(1e-3)
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    opt_state = opt.init(params)
    ckpt = make_checkpoint(5, 17, params, {"bn": jnp.ones((3,))}, [opt_state], 0.25, 1,
                           np.zeros((2,), np.uint32))

    w = Writer(logdir=str(tmp_path), make_subdir=False, tee=False,
               checkpoint_backend="orbax")
    w.write_checkpoint("latest", ckpt)
    restored = w.load_checkpoint("latest")

    assert restored["epoch"] == 5 and restored["iteration"] == 17
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    # structure fidelity: the restored opt state must drive optax directly
    r_state = restore_arrays(restored["opt_states"])[0]
    grads = {"w": jnp.ones((2, 3)), "b": jnp.ones((3,))}
    updates, _ = opt.update(grads, r_state)
    assert set(updates) == {"w", "b"}
    # backend auto-detection: DummyWriter load without the backend flag
    d = DummyWriter(logdir=str(tmp_path))
    assert d.load_checkpoint("latest")["epoch"] == 5


def test_orbax_torn_checkpoint_rejected(tmp_path):
    """A meta sidecar whose token mismatches the array payload (crash between
    orbax finalize and meta replace) must fail loudly, never restore silently
    (ADVICE r1: orbax atomicity)."""
    import pickle

    import jax.numpy as jnp

    w = Writer(logdir=str(tmp_path), make_subdir=False, tee=False,
               checkpoint_backend="orbax")
    ckpt = make_checkpoint(1, 1, {"w": jnp.ones((2,))}, {}, [], 0.0, 0,
                           np.zeros((2,), np.uint32))
    w.write_checkpoint("latest", ckpt)
    w.load_checkpoint("latest")  # sane roundtrip first

    # Tear it: rewrite the meta with a different token (stale/new mismatch)
    meta_path = os.path.join(w._checkpoints_dir, "latest.orbax.meta.pkl")
    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    meta["token"] = "0" * 32
    with open(meta_path, "wb") as f:
        pickle.dump(meta, f)
    with pytest.raises(RuntimeError, match="torn"):
        w.load_checkpoint("latest")
