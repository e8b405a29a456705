"""Test harness: run everything on an 8-device virtual CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-sets JAX_PLATFORMS to a TPU plugin and ignores
env-var overrides, so the platform is forced via jax.config instead. Set
TNF_TEST_PLATFORM=tpu to run the suite on real hardware.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("TNF_TEST_PLATFORM", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
