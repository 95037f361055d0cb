"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import.

The reference has no test suite at all (SURVEY.md §4); this is the fake-
backend capability it lacks — multi-chip sharding tests run on virtual CPU
devices so CI needs no TPU.
"""

import os

# Force-override: the ambient environment points JAX_PLATFORMS at the real
# TPU tunnel ("axon"); unit tests must run on the virtual CPU mesh.  NOTE the
# host's sitecustomize imports jax *before* conftest runs, so the env var
# alone is too late — jax.config.update still works because no backend has
# been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent compilation cache is also force-disabled: this host's
# advertised CPU features vary between runs and cached AOT code has produced
# silent wrong results (see .claude/skills/verify/SKILL.md).
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices())
)
