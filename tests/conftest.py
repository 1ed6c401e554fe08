"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding semantics are exercised without TPU hardware
(SURVEY.md §4d).

The container's ``sitecustomize`` registers the tunneled-TPU ("axon") PJRT
plugin in every interpreter, which routes *all* compilations — including CPU
ones — through a remote-compile relay at ~1-2 s per op. That makes eager unit
tests unusably slow, and the hook runs before any conftest can set env vars.
Fix: re-exec the interpreter once with a scrubbed environment before any test
imports jax.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_CMF_TPU_TEST_REEXEC"):
    env = dict(os.environ)
    env["_CMF_TPU_TEST_REEXEC"] = "1"
    # Disable the axon plugin registration entirely for the test process.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(sys.executable, list(sys.orig_argv), env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
