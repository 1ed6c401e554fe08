"""Schema parity against the reference compiler.

The reference's config package is pure Python (no torch), so when the
read-only reference checkout is present we can import its `get_schema` and
compare compiled layer lists value-for-value across the model zoo — the
strongest guard against schema drift. Skipped when the reference isn't
mounted.
"""

import copy
import importlib
import sys

import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref_config():
    import os

    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference checkout not mounted")
    sys.path.insert(0, REFERENCE_PATH)
    # Force a fresh import of the reference's `config` package (ours is
    # cmf_tpu.config, no collision).
    for mod in list(sys.modules):
        if mod == "config" or mod.startswith("config."):
            del sys.modules[mod]
    ref = importlib.import_module("config")
    yield ref
    sys.path.remove(REFERENCE_PATH)
    for mod in list(sys.modules):
        if mod == "config" or mod.startswith("config."):
            del sys.modules[mod]


CASES = [
    ("sphere", "non-square", False),
    ("sphere", "non-square", True),
    ("sphere", "realnvp", False),
    ("sphere", "maf", True),
    ("sphere", "nsf-ar", True),
    ("sphere", "bnaf", True),
    ("sphere", "planar", True),
    ("power", "non-square", False),
    ("miniboone", "non-square", False),
    ("miniboone", "non-square", True),
    ("power", "realnvp", True),
    ("power", "maf", False),
    ("mnist", "non-square", False),
    ("mnist", "realnvp", True),
    ("mnist", "glow", True),
]


def _resolve_grid(config):
    from cmf_tpu.config import expand_grid

    return expand_grid(config)[0]


@pytest.mark.parametrize("dataset,model,baseline", CASES)
def test_schema_matches_reference(ref_config, dataset, model, baseline):
    from cmf_tpu.config import get_config as my_get_config
    from cmf_tpu.config import get_schema as my_get_schema

    ref_cfg = ref_config.get_config(dataset=dataset, model=model, use_baseline=baseline)
    my_cfg = my_get_config(dataset=dataset, model=model, use_baseline=baseline)

    # Configs must agree key-for-key (GridParams compared by value list)
    def normalize(c):
        out = {}
        for k, v in c.items():
            if type(v).__name__ == "GridParams":
                out[k] = ("GridParams", list(v))
            else:
                out[k] = v
        return out

    assert normalize(my_cfg) == normalize(ref_cfg), f"config drift for {dataset}/{model}"

    # Expand grids identically and compare compiled schemas
    ref_grid = ref_config.expand_grid(copy.deepcopy(ref_cfg))
    from cmf_tpu.config import expand_grid as my_expand

    my_grid = my_expand(copy.deepcopy(my_cfg))
    assert len(ref_grid) == len(my_grid)

    for rc, mc in zip(ref_grid, my_grid):
        ref_schema = ref_config.get_schema(rc)
        my_schema = my_get_schema(mc)
        assert my_schema == ref_schema, (
            f"schema drift for {dataset}/{model} baseline={baseline}"
        )
