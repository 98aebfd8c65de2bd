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

# XLA:CPU on this host lowers DEFAULT-precision fp32 convolutions/dots
# through a bf16-accelerated path (~3e-3 relative error vs an fp64
# oracle — measured, round 4); golden parity against torch (which is
# exactly fp32 on CPU) needs exact fp32 math. Explicit per-op precisions
# (the Pallas kernels, pairwise_sqdist) are unaffected by this default.
jax.config.update("jax_default_matmul_precision", "highest")
