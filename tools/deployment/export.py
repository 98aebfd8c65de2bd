#!/usr/bin/env python
"""Model export for deployment (reference tools/deployment/pytorch2onnx.py /
onnx2tensorrt.py analog, TPU-world):

  * ``stablehlo`` — serialize the jitted eval forward with jax.export
    (portable StableHLO artifact; the ONNX analog).
  * ``savedmodel`` — TF SavedModel via jax2tf (the serving analog).

``--verify`` round-trips the artifact and compares outputs against the
native forward (the reference's pytorch2onnx --verify behavior).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--format", choices=["stablehlo", "savedmodel"],
                   default="stablehlo")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--verify", action="store_true")
    args = p.parse_args()

    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from inference import init_model  # tools/inference.py

    model, state, cfg = init_model(args.config, args.checkpoint)
    size = cfg.model["size"]
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants}

    def forward(imgs):
        cls_score, _ = model.apply(variables, imgs, train=False)
        return jax.nn.sigmoid(cls_score.astype(jnp.float32))

    x_spec = jax.ShapeDtypeStruct((args.batch, size, size, 3), jnp.float32)
    sample = np.random.default_rng(0).standard_normal(
        (args.batch, size, size, 3)).astype(np.float32)

    if args.format == "stablehlo":
        from jax import export as jexport

        exported = jexport.export(jax.jit(forward))(x_spec)
        blob = exported.serialize()
        with open(args.out, "wb") as f:
            f.write(blob)
        print(f"wrote StableHLO artifact ({len(blob)} bytes) -> {args.out}")
        if args.verify:
            reloaded = jexport.deserialize(blob)
            got = np.asarray(reloaded.call(sample))
            want = np.asarray(forward(jnp.asarray(sample)))
            np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
            print("verify OK: exported outputs match native forward")
    else:
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = tf.function(
            jax2tf.convert(forward, with_gradient=False),
            input_signature=[tf.TensorSpec((args.batch, size, size, 3),
                                           tf.float32)],
            autograph=False)
        module = tf.Module()
        module.serve = tf_fn
        tf.saved_model.save(module, args.out)
        print(f"wrote SavedModel -> {args.out}")
        if args.verify:
            loaded = tf.saved_model.load(args.out)
            got = loaded.serve(tf.constant(sample)).numpy()
            want = np.asarray(forward(jnp.asarray(sample)))
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
            print("verify OK: SavedModel outputs match native forward")


if __name__ == "__main__":
    main()
