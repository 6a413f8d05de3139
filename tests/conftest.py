"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths (jax.sharding.Mesh / shard_map) are exercised
without TPU hardware.

The container's sitecustomize registers an 'axon' TPU PJRT plugin and the
environment pins JAX_PLATFORMS=axon (single remote chip behind a relay —
far too slow for per-op unit tests). jax is already imported by the time
conftest runs, but backends are not yet initialized, so overriding via
jax.config still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
