"""Test configuration: two tiers.

Default tier — everything on a virtual 8-device CPU mesh: multi-chip
sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4).  Must run before
the first ``import jax`` anywhere in the test session.

TPU tier (``QBMX_TPU_TESTS=1 python -m pytest tests/ -m tpu``) — leaves the
platform on the real chip and runs ONLY the ``tpu``-marked tests: the
on-chip-PRNG Pallas paths that the interpreter cannot cover (VERDICT r2
"What's weak" #7 — a silent Mosaic miscompile of the PRNG path must be
caught by CI discipline, not by remembering to run a script).  Only one
process may use the TPU at a time (CLAUDE.md) — never run both tiers
concurrently.
"""

import os

TPU_MODE = bool(os.environ.get("QBMX_TPU_TESTS"))

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_MODE:
    # The hosting image pre-registers a TPU plugin and force-overrides
    # jax_platforms at import time; env vars alone don't win. Override back.
    jax.config.update("jax_platforms", "cpu")
else:
    # Amortize the remote AOT compiles across TPU test sessions (the
    # first-call compile is the dominant cost on axon, CLAUDE.md).
    cache = os.environ.get(
        "QBMX_COMPILE_CACHE", os.path.expanduser("~/.cache/qbmx_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware (QBMX_TPU_TESTS=1 python -m pytest -m tpu)",
    )


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        skip = pytest.mark.skip(
            reason="TPU session runs only -m tpu tests (CPU tier is forced "
            "off the chip)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs real TPU (QBMX_TPU_TESTS=1 on hardware)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
