"""Test harness: run everything on an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-sets JAX_PLATFORMS to a TPU plugin and ignores
env-var overrides, so the platform is forced via jax.config instead. Set
TNF_TEST_PLATFORM=axon to run the suite on real hardware through the
tunnel plugin (TNF_TEST_PLATFORM=tpu for a locally-attached chip).

On-hardware skip-list: the axon backend has NO complex-dtype support, and
one failed complex program wedges the backend for the rest of the process
(every later program returns UNIMPLEMENTED) — so complex tests are marked
`complex_dtype` and skipped on non-CPU backends. Mesh-equality tests in
test_parallel.py skip themselves when fewer than 8 devices are visible.
"""
import os
import sys

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("TNF_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "complex_dtype: test computes with complex dtypes on the default "
        "backend (skipped on TPU/axon, which has no complex support)")


def pytest_collection_modifyitems(config, items):
    if jax.devices()[0].platform == "cpu":
        return
    skip = pytest.mark.skip(
        reason="complex dtypes unsupported on the axon TPU backend "
               "(one failed program wedges the process)")
    for item in items:
        if "complex_dtype" in item.keywords:
            item.add_marker(skip)
