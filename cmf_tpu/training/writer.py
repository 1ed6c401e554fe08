"""Run-dir writer: scalars, json/numpy/figure artifacts, atomic checkpoints.

Contract: reference cmf/writer.py — timestamped run dirs, ``<group>/<tag>``
scalar naming, atomic checkpoint writes via tmp-file + os.replace
(writer.py:105-116), DummyWriter that no-ops writes but still loads
checkpoints (writer.py:133-162), stdout/stderr tee into the run dir.

Backend: scalars go to a JSONL file (always) and to TensorBoard if
``torch.utils.tensorboard`` is importable — replacing tensorboardX.
"""

import json
import os
import pickle
import sys
import time


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
    def __init__(self, logdir, make_subdir=True, tag_group="", rundir_tail="", tee=True):
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
        """Atomic write (writer.py:105-116)."""
        os.makedirs(self._checkpoints_dir, exist_ok=True)
        final_path = self._checkpoint_path(tag)
        tmp_path = final_path + ".tmp"
        with open(tmp_path, "wb") as f:
            pickle.dump(data, f)
        os.replace(tmp_path, final_path)

    def load_checkpoint(self, tag):
        with open(self._checkpoint_path(tag), "rb") as f:
            return pickle.load(f)

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
        with open(os.path.join(self.logdir, "checkpoints", f"{tag}.pkl"), "rb") as f:
            return pickle.load(f)
