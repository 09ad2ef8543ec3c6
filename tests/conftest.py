"""Test harness config: force CPU platform with 8 virtual devices so that
multi-chip sharding paths are exercised without TPU hardware, and enable
x64 so float64 oracle cross-checks work."""

import os

# The session environment presets JAX_PLATFORMS=axon (TPU) and the baked
# sitecustomize pins the axon backend via jax.config, so the env var alone is
# not enough — override through jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
