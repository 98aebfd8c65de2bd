"""Exported-model inference wrappers (reference mmcls/core/export/test.py:
ONNXRuntimeClassifier / TensorRTClassifier, TPU-world).

The TPU deployment formats are StableHLO (``jax.export`` serialized bytes —
the portable ONNX analog) and TF SavedModel (the serving analog, via
jax2tf). Both wrappers expose the same ``__call__(imgs) -> (B, C) scores``
contract as the native jitted forward, so an exported artifact runs through
the *same* evaluation harness (tools/deployment/test.py) — the closest
thing the reference has to a golden-output test
(reference tools/deployment/test.py:1-130, core/export/test.py:11-96).
"""

from __future__ import annotations

import numpy as np


class StableHLOClassifier:
    """Run a serialized ``jax.export`` artifact (fixed input shape).

    Mirrors ONNXRuntimeClassifier (core/export/test.py:11-53): load the
    artifact once, then score batches. The exported computation already
    includes the sigmoid head used by the eval path.
    """

    def __init__(self, artifact_path: str):
        from jax import export as jexport

        with open(artifact_path, "rb") as f:
            self._exported = jexport.deserialize(f.read())
        # (batch, H, W, 3)
        self.input_shape = tuple(self._exported.in_avals[0].shape)
        self.batch = self.input_shape[0]

    def __call__(self, imgs: np.ndarray) -> np.ndarray:
        assert imgs.shape == self.input_shape, (imgs.shape, self.input_shape)
        return np.asarray(self._exported.call(imgs.astype(np.float32)))


class SavedModelClassifier:
    """Run a TF SavedModel exported by tools/deployment/export.py
    (TensorRTClassifier analog, core/export/test.py:56-96)."""

    def __init__(self, model_dir: str):
        import tensorflow as tf  # noqa: deferred heavy import

        self._tf = tf
        self._module = tf.saved_model.load(model_dir)
        spec = self._module.serve.input_signature[0]
        self.input_shape = tuple(int(d) for d in spec.shape)
        self.batch = self.input_shape[0]

    def __call__(self, imgs: np.ndarray) -> np.ndarray:
        assert imgs.shape == self.input_shape, (imgs.shape, self.input_shape)
        return self._module.serve(
            self._tf.constant(imgs.astype(np.float32))).numpy()


def load_exported_classifier(path: str, backend: str = "auto"):
    """Build the right wrapper from a path (file = stablehlo, dir =
    savedmodel) or an explicit ``backend`` in {'stablehlo', 'savedmodel'}."""
    import os

    if backend == "auto":
        backend = "savedmodel" if os.path.isdir(path) else "stablehlo"
    if backend == "stablehlo":
        return StableHLOClassifier(path)
    if backend == "savedmodel":
        return SavedModelClassifier(path)
    raise ValueError(f"unknown backend {backend!r}")
