"""Test harness: force the CPU backend with 8 virtual devices.

The axon TPU plugin registers itself as the default backend at interpreter
start (sitecustomize) and ignores JAX_PLATFORMS from the environment, so the
CPU override must go through jax.config after import. Multi-chip sharding
tests use the 8 virtual CPU devices (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
