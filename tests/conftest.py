"""Test harness config.

Tests run on CPU with 8 virtual devices by default (SURVEY.md §4.2): numerics
are identical to TPU for everything except the Pallas-compiled kernels, which
are covered in interpret mode here and compiled-on-TPU in the opt-in `tpu`
marker tests (RUN_TPU_TESTS=1).
"""

import os

# Must be set before jax is imported anywhere.
if os.environ.get("RUN_TPU_TESTS") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU chip (opt-in via RUN_TPU_TESTS=1)"
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_TPU_TESTS") == "1":
        return
    skip_tpu = pytest.mark.skip(reason="needs real TPU; set RUN_TPU_TESTS=1")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
