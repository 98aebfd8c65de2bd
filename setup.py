"""Package setup: installs gkgnet_tpu and builds the native host-ops
extension (gkgnet_tpu/native/fastops.cpp). The extension is optional — the
package falls back to numpy when it is absent (see gkgnet_tpu/native)."""

from setuptools import Extension, find_packages, setup

setup(
    name="gkgnet_tpu",
    version="0.1.0",
    description=("TPU-native (JAX/XLA/Pallas) multi-label Vision-GNN "
                 "framework with GKGNet capabilities"),
    packages=find_packages(include=["gkgnet_tpu", "gkgnet_tpu.*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "orbax-checkpoint", "numpy", "Pillow",
    ],
    ext_modules=[
        Extension(
            "gkgnet_tpu.native._fastops",
            sources=["gkgnet_tpu/native/fastops.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            optional=True,
        ),
    ],
)
