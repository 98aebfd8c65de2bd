"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the TPU-world
equivalent of a fake process group)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment pins jax_platforms elsewhere (axon plugin); the config
# update is authoritative and must happen before any backend is touched.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
