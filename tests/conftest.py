"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device tests run on CPU via XLA's host-platform device splitting — the
TPU-native substitute for "multi-node without a real cluster" (SURVEY.md §4).
Must set the flags before jax initializes, hence top of conftest.
"""
import os

# Force CPU even when the shell pre-sets JAX_PLATFORMS (e.g. to a TPU plugin):
# tests must be hermetic and tunnel-free.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The suite is XLA-compile dominated (every test jits fresh programs in a
# fresh process). A persistent compilation cache makes re-runs cheap; keyed
# by content hash, so it can never mask a code change. Set via env (not
# jax.config) so subprocess-spawning tests (graft dryrun, multi-host init)
# inherit it. Disable with KVAE_TEST_COMPILE_CACHE=0 (e.g. when bisecting
# compiler behavior).
if os.environ.get("KVAE_TEST_COMPILE_CACHE", "1") != "0":
    _cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "kvae_tpu_xla_tests"
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    # skip sub-second compiles: they'd bloat the cache for no win
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax  # noqa: E402

# Plugins (e.g. jaxtyping) may import jax before this conftest runs, making
# the env vars above too late; the config route still wins as long as no
# backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (Pallas interpret mode / long sequences); "
        "excluded from `make test`, run in CI via `make test-all`",
    )


def pytest_addoption(parser):
    # Mirror the reference's --no-stability flag (reference tests/conftest.py:4-18)
    parser.addoption(
        "--no-stability",
        action="store_true",
        default=False,
        help="skip golden-output stability tests",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--no-stability"):
        skip = pytest.mark.skip(reason="--no-stability given")
        for item in items:
            if "stability" in item.module.__name__:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
