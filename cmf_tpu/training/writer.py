"""Run-dir writer: scalars, json/numpy/figure artifacts, atomic checkpoints.

Contract: reference cmf/writer.py — timestamped run dirs, ``<group>/<tag>``
scalar naming, atomic checkpoint writes via tmp-file + os.replace
(writer.py:105-116), DummyWriter that no-ops writes but still loads
checkpoints (writer.py:133-162), stdout/stderr tee into the run dir.

Backend: scalars go to a JSONL file (always) and to TensorBoard if
``torch.utils.tensorboard`` is importable — replacing tensorboardX.
"""

import atexit
import json
import os
import pickle
import sys
import time


class _OrbaxIO:
    """Async orbax checkpoint IO (ROADMAP: multihost async checkpointing).

    Layout per tag: ``<tag>.orbax/`` holds the array leaves written by orbax
    (atomic finalize, multihost-coordinated at pod scale);
    ``<tag>.orbax.meta.pkl`` holds the pytree treedef plus non-array leaves so
    restores rebuild the EXACT structure — optax namedtuple states come back
    as namedtuples, not orbax's dict-ification.

    Asynchrony: the checkpoint payload is already host numpy (checkpoint.py
    ``to_host``), so the *synchronous* orbax checkpointer runs on a dedicated
    worker thread — training resumes immediately, one save in flight at a
    time. orbax's own AsyncCheckpointer commit thread races python 3.12's
    concurrent-futures shutdown flag at interpreter exit ("cannot schedule
    new futures after shutdown"); draining our worker via
    ``threading._register_atexit`` (runs in *reverse* registration order,
    i.e. before the executor shutdown hook registered at import time)
    avoids that entirely.
    """

    _ckptr = None
    _executor = None
    _pending = None

    @classmethod
    def _get(cls):
        if cls._ckptr is None:
            import concurrent.futures
            import orbax.checkpoint as ocp

            cls._ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
            cls._executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="cmf-ckpt"
            )
            try:
                import threading

                threading._register_atexit(cls.wait_until_finished)
            except Exception:
                atexit.register(cls.wait_until_finished)
        return cls._ckptr

    @classmethod
    def wait_until_finished(cls):
        if cls._pending is not None:
            pending, cls._pending = cls._pending, None
            pending.result()  # re-raises background save failures

    @classmethod
    def save(cls, dirpath, data):
        import uuid

        import numpy as np
        import jax
        import orbax.checkpoint as ocp

        ckptr = cls._get()
        cls.wait_until_finished()  # one in-flight save per process
        leaves, treedef = jax.tree.flatten(data)
        arrays, aux = {}, {}
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, (np.ndarray, jax.Array)):
                arrays[str(i)] = np.asarray(leaf)
            else:
                aux[i] = leaf
        # Atomicity across the two artifacts (arrays dir + meta sidecar): a
        # per-save token is embedded in BOTH, the meta replace happens only
        # AFTER orbax finalizes the array dir (inside the async job), and
        # load() verifies the tokens match.  A crash anywhere leaves either a
        # fully consistent old pair, a consistent new pair, or a token
        # mismatch that load() rejects loudly — never a silent new-meta /
        # old-arrays restore.
        token = uuid.uuid4().hex
        arrays["__save_token__"] = np.frombuffer(
            token.encode("ascii"), dtype=np.uint8
        ).copy()
        meta = {
            "treedef": treedef,
            "aux": aux,
            "num_leaves": len(leaves),
            "token": token,
        }

        def _save_job():
            ckptr.save(
                os.path.abspath(dirpath), args=ocp.args.PyTreeSave(arrays), force=True
            )
            tmp = dirpath + ".meta.pkl.tmp"
            with open(tmp, "wb") as f:
                pickle.dump(meta, f)
            os.replace(tmp, dirpath + ".meta.pkl")

        cls._pending = cls._executor.submit(_save_job)

    @classmethod
    def load(cls, dirpath):
        import jax

        ckptr = cls._get()
        cls.wait_until_finished()
        with open(dirpath + ".meta.pkl", "rb") as f:
            meta = pickle.load(f)
        arrays = ckptr.restore(os.path.abspath(dirpath))
        saved_token = arrays.pop("__save_token__", None)
        if saved_token is not None or "token" in meta:
            arr_token = (
                bytes(bytearray(int(b) for b in saved_token)).decode("ascii")
                if saved_token is not None
                else None
            )
            if arr_token != meta.get("token"):
                raise RuntimeError(
                    f"orbax checkpoint {dirpath!r} is torn: meta token "
                    f"{meta.get('token')!r} != array token {arr_token!r} "
                    "(crash between array finalize and meta replace?)"
                )
        leaves = [None] * meta["num_leaves"]
        for i, v in meta["aux"].items():
            leaves[i] = v
        for k, v in arrays.items():
            leaves[int(k)] = v
        return jax.tree.unflatten(meta["treedef"], leaves)


def _load_checkpoint_from(checkpoints_dir, tag):
    """Backend auto-detection so resumes work regardless of the backend that
    wrote the run (pickle first — the default — then orbax)."""
    _OrbaxIO.wait_until_finished()  # meta sidecar lands at async-save commit
    pkl = os.path.join(checkpoints_dir, f"{tag}.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            return pickle.load(f)
    orbax_dir = os.path.join(checkpoints_dir, f"{tag}.orbax")
    if os.path.exists(orbax_dir + ".meta.pkl"):
        return _OrbaxIO.load(orbax_dir)
    raise FileNotFoundError(pkl)


class Tee:
    """Duplicate a stream into a file (writer.py:12-36)."""

    def __init__(self, primary, secondary_path):
        self._primary = primary
        self._secondary = open(secondary_path, "a", buffering=1)

    def write(self, data):
        self._primary.write(data)
        self._secondary.write(data)

    def flush(self):
        self._primary.flush()
        self._secondary.flush()

    def __getattr__(self, name):
        return getattr(self._primary, name)


class Writer:
    def __init__(
        self,
        logdir,
        make_subdir=True,
        tag_group="",
        rundir_tail="",
        tee=True,
        checkpoint_backend="pickle",
    ):
        assert checkpoint_backend in ("pickle", "orbax")
        self._ckpt_backend = checkpoint_backend
        if make_subdir:
            os.makedirs(logdir, exist_ok=True)
            timestamp = time.strftime("%b%d_%H-%M-%S")
            candidate = os.path.join(logdir, timestamp + rundir_tail)
            # Same-second launches (multi-seed loops) must not share a dir —
            # the reference's timestamp-only naming silently collides.
            suffix = 0
            logdir = candidate
            while os.path.exists(logdir):
                suffix += 1
                logdir = f"{candidate}_{suffix}"
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._tag_group = tag_group
        self._scalar_file = open(os.path.join(logdir, "scalars.jsonl"), "a", buffering=1)

        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            pass

        if tee:
            sys.stdout = Tee(sys.stdout, os.path.join(logdir, "stdout"))
            sys.stderr = Tee(sys.stderr, os.path.join(logdir, "stderr"))

    def _tag(self, tag):
        return f"{self._tag_group}/{tag}" if self._tag_group else tag

    def write_scalar(self, tag, value, global_step=None):
        value = float(value)
        self._scalar_file.write(
            json.dumps({"tag": self._tag(tag), "value": value, "step": global_step}) + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(self._tag(tag), value, global_step=global_step)

    def write_image(self, tag, image_chw, global_step=None):
        if self._tb is not None:
            self._tb.add_image(self._tag(tag), image_chw, global_step=global_step)

    def write_figure(self, tag, figure, global_step=None):
        figure.savefig(os.path.join(self.logdir, f"{tag.replace('/', '_')}.pdf"))
        if self._tb is not None:
            self._tb.add_figure(self._tag(tag), figure, global_step=global_step)

    def write_json(self, tag, data):
        with open(os.path.join(self.logdir, f"{tag}.json"), "w") as f:
            json.dump(data, f, indent=4)
        if self._tb is not None:
            self._tb.add_text(self._tag(tag), f"```\n{json.dumps(data, indent=4)}\n```")

    def write_textfile(self, tag, text):
        with open(os.path.join(self.logdir, f"{tag}.txt"), "w") as f:
            f.write(text)

    def write_numpy(self, tag, array):
        import numpy as np

        np.save(os.path.join(self.logdir, f"{tag}.npy"), array)

    def write_checkpoint(self, tag, data):
        """Atomic write (writer.py:105-116); orbax backend is async."""
        os.makedirs(self._checkpoints_dir, exist_ok=True)
        if self._ckpt_backend == "orbax":
            _OrbaxIO.save(os.path.join(self._checkpoints_dir, f"{tag}.orbax"), data)
            return
        final_path = self._checkpoint_path(tag)
        tmp_path = final_path + ".tmp"
        with open(tmp_path, "wb") as f:
            pickle.dump(data, f)
        os.replace(tmp_path, final_path)

    def load_checkpoint(self, tag):
        return _load_checkpoint_from(self._checkpoints_dir, tag)

    @property
    def _checkpoints_dir(self):
        return os.path.join(self.logdir, "checkpoints")

    def _checkpoint_path(self, tag):
        return os.path.join(self._checkpoints_dir, f"{tag}.pkl")


class DummyWriter:
    """No-op writes; checkpoint loads still work from ``logdir``
    (writer.py:133-162)."""

    def __init__(self, logdir=None):
        self.logdir = logdir

    def write_scalar(self, tag, value, global_step=None):
        pass

    def write_image(self, tag, image, global_step=None):
        pass

    def write_figure(self, tag, figure, global_step=None):
        pass

    def write_json(self, tag, data):
        pass

    def write_textfile(self, tag, text):
        pass

    def write_numpy(self, tag, array):
        pass

    def write_checkpoint(self, tag, data):
        pass

    def load_checkpoint(self, tag):
        if self.logdir is None:
            raise FileNotFoundError("DummyWriter has no logdir")
        return _load_checkpoint_from(os.path.join(self.logdir, "checkpoints"), tag)
