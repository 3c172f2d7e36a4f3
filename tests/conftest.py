"""Test configuration: force CPU JAX with 8 virtual devices for mesh tests."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests are hermetic-CPU; TPU via bench.py
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize may have imported jax already with the TPU backend;
# re-point it at CPU before any backend initialization happens.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(HERE, "fixtures")
GOLDEN = os.path.join(HERE, "golden")


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def hermetic_cpu_env() -> dict:
    """Subprocess env with any accelerator-relay sitecustomize stripped:
    tests must not depend on a live device tunnel (the relay's register()
    overrides JAX_PLATFORMS, so env pinning alone is not enough)."""
    env = dict(os.environ)
    extra = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.join(HERE, "..")] + extra)
    for k in list(env):
        if "AXON" in k:
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    return env
