"""OOD pipeline e2e on synthetic image data (experiment.py:236-338 parity):
4 passes, npy dumps, per-dataset json summaries, stump classification."""

import os

import numpy as np
import pytest

from cmf_tpu.config import expand_grid, get_config
from cmf_tpu.training import generate_ood_metrics, ood_classification, train


@pytest.mark.slow
def test_ood_pipeline(tmp_path):
    cfg = get_config("mnist", "non-square", use_baseline=False)
    cfg = expand_grid(cfg)[0]
    cfg.update({
        "seed": 0, "dataset": "mnist", "model": "non-square",
        "max_epochs": 1, "epochs_per_test": 100,
        "g_hidden_channels": [4] * 2, "prior_num_density_layers": 2,
        "prior_hidden_channels": [8] * 2, "latent_dimension": 4,
        "train_batch_size": 50, "valid_batch_size": 50, "test_batch_size": 50,
        "early_stopping": False, "use_fid": False,
        "likelihood_warmup": False,
        "synthetic_data": True, "logdir_root": str(tmp_path),
    })
    setup = train(cfg)
    logdir = setup["writer"].logdir

    generate_ood_metrics(cfg, logdir)
    for split in ("train", "test"):
        for label in ("in", "out"):
            path = os.path.join(logdir, f"ood_metrics_{split}_{label}.npy")
            assert os.path.exists(path), path
            arr = np.load(path)
            assert arr.shape[1] == 2 and np.all(np.isfinite(arr))
    assert os.path.exists(os.path.join(logdir, "ood_metrics_mnist_train=True.json"))
    assert os.path.exists(os.path.join(logdir, "ood_metrics_fashion-mnist_train=False.json"))

    rates = ood_classification(logdir)
    assert set(rates) == {
        "train/likelihood", "train/reconstruction-error",
        "test/likelihood", "test/reconstruction-error",
    }
    assert all(0.5 <= v <= 1.0 for v in rates.values())
