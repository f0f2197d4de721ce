"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4's substitute
for the reference's absent distributed tests).

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we must use
jax.config.update *before any backend initializes* — hence this runs at
conftest import, ahead of every test module.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
