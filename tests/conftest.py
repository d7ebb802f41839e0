"""Test harness config.

Tests run on CPU with 8 virtual devices by default (SURVEY.md §4.2): numerics
are identical to TPU for everything except the Pallas-compiled kernels, which
are covered in interpret mode here and compiled-on-TPU in the opt-in `tpu`
marker tests (RUN_TPU_TESTS=1).

NOTE this environment's sitecustomize (axon TPU tunnel) force-sets
``jax.config.jax_platforms = "axon,cpu"`` in every process, overriding the
JAX_PLATFORMS env var — so we must override back through the config API
*after* jax is imported but before any backend initializes.
"""

import os

TPU_MODE = os.environ.get("RUN_TPU_TESTS") == "1"

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU chip (opt-in via RUN_TPU_TESTS=1)"
    )
    config.addinivalue_line(
        "markers",
        "slow: long-running test (excluded from the fast tier: -m 'not slow')",
    )


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        return
    skip_tpu = pytest.mark.skip(reason="needs real TPU; set RUN_TPU_TESTS=1")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
