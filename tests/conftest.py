"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import.

The reference has no test suite at all (SURVEY.md §4); this is the fake-
backend capability it lacks — multi-chip sharding tests run on virtual CPU
devices so CI needs no TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
