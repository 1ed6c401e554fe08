#!/usr/bin/env python3
"""Copy run evidence (config.json + metrics.json only) from a runs dir into
a committed evidence dir, preserving the <dataset>/<run>/ layout — the
battery/repro evidence pattern (checkpoints and tf event files stay out of
git).

Usage: python analysis/_copy_evidence.py <runs_dir> <evidence_dir>
"""

import os
import shutil
import sys


def copy_evidence(runs_dir, evidence_dir, files=("config.json", "metrics.json")):
    n = 0
    for root, _dirs, names in os.walk(runs_dir):
        if "metrics.json" not in names:
            continue
        rel = os.path.relpath(root, runs_dir)
        dest = os.path.join(evidence_dir, rel)
        os.makedirs(dest, exist_ok=True)
        for f in files:
            if f in names:
                shutil.copy2(os.path.join(root, f), os.path.join(dest, f))
        n += 1
    return n


if __name__ == "__main__":
    print(copy_evidence(sys.argv[1], sys.argv[2]), "runs copied")
