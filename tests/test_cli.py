"""CLI end-to-end tests: introspection modes, grid×seed fan-out, grid-shard.

Runs main.py in-process (argv injection) — subprocesses would pay the jax
re-import and env scrubbing cost per test.
"""

import json
import os

import pytest

import main as cli


def run_cli(args):
    cli.main(args)


def test_print_schema(capsys):
    # -s disables capture in pytest.ini; use a pipe-less smoke: just run it
    run_cli(["--model", "non-square", "--dataset", "sphere", "--print-schema"])


def test_print_config():
    run_cli(["--model", "non-square", "--dataset", "power", "--print-config"])


def test_print_num_params():
    run_cli(
        ["--model", "realnvp", "--dataset", "sphere", "--baseline",
         "--print-num-params", "--config", "num_density_layers=1",
         "--config", "coupler_hidden_channels=[4,4]"]
    )


def test_grid_and_seeds_fan_out(tmp_path):
    """GridParams × --num-seeds expands into distinct runs; --grid-shard
    splits them across hosts (main.py:141-158 + TPU extension)."""
    args = [
        "--model", "non-square", "--dataset", "sphere",
        "--logdir-root", str(tmp_path),
        "--config", "max_epochs=1",
        "--config", "epochs_per_test=100",
        "--config", "num_density_layers=1",
        "--config", "coupler_hidden_channels=[4,4]",
        "--config", "train_batch_size=1000",
        "--config", "early_stopping=False",
    ]
    run_cli(args + ["--num-seeds", "2"])
    runs = os.listdir(tmp_path / "sphere")
    assert len(runs) == 2
    seeds = set()
    for r in runs:
        cfg = json.load(open(tmp_path / "sphere" / r / "config.json"))
        seeds.add(cfg["seed"])
    assert len(seeds) == 2


def test_grid_shard_selects_subset(tmp_path):
    args = [
        "--model", "non-square", "--dataset", "sphere",
        "--logdir-root", str(tmp_path),
        "--config", "max_epochs=1",
        "--config", "epochs_per_test=100",
        "--config", "num_density_layers=1",
        "--config", "coupler_hidden_channels=[4,4]",
        "--config", "early_stopping=False",
        "--num-seeds", "3",
        "--grid-shard", "0/3",
    ]
    run_cli(args)
    assert len(os.listdir(tmp_path / "sphere")) == 1
