#!/usr/bin/env python
"""Class activation visualization (reference tools/visualizations/vis_cam.py
analog): overlays (a) the channel-mean stage-4 activation map and (b) the
input-gradient saliency for the target class onto the image.

(The reference uses pytorch-grad-cam hooks; in a functional model the
class-conditional signal comes from the input-space gradient, and the
activation map from the captured final-stage features.)"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--target-class", type=int, default=None,
                   help="class id (default: top prediction)")
    p.add_argument("--out", default="cam.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from inference import init_model

    from gkgnet_tpu.data.pipelines import build_pipeline

    model, state, cfg = init_model(args.config, args.checkpoint)
    pipeline = build_pipeline(cfg.data["test"]["pipeline"])
    results = pipeline({"img_prefix": "", "img_info": {"filename": args.img}},
                       np.random.default_rng(0))
    imgs = jnp.asarray(results["img"][None])
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants}
    last = "backbone_14_ffn"  # stage-4 output

    def fwd(imgs):
        (score, _), inter = model.apply(
            variables, imgs, train=False,
            capture_intermediates=lambda mdl, _: mdl.name == last,
            mutable=["intermediates"])
        feat = jax.tree.leaves(inter["intermediates"])[0]
        return score, feat

    score, feat = jax.jit(fwd)(imgs)
    cls = int(args.target_class if args.target_class is not None
              else jnp.argmax(score[0]))

    # class-conditional input-gradient saliency
    grad_img = jax.jit(jax.grad(lambda im: fwd(im)[0][0, cls]))(imgs)
    saliency = np.asarray(jnp.abs(grad_img)[0].max(-1))
    saliency = saliency / (saliency.max() + 1e-8)

    # final-stage activation magnitude
    cam = np.maximum(np.asarray(feat)[0], 0).mean(-1)
    cam = cam / (cam.max() + 1e-8)

    size = cfg.model["size"]
    cam_up = np.asarray(
        Image.fromarray(np.uint8(cam * 255)).resize((size, size),
                                                    Image.BILINEAR),
        np.float32) / 255.0
    heat = 0.5 * cam_up + 0.5 * saliency

    with Image.open(args.img) as im:
        base = np.asarray(im.convert("RGB").resize((size, size)), np.float32)
    overlay = base.copy()
    overlay[..., 0] = np.clip(base[..., 0] + 255 * heat, 0, 255)
    Image.fromarray(np.uint8(overlay)).save(args.out)
    print(f"saved activation/saliency map for class {cls} -> {args.out}")


if __name__ == "__main__":
    main()
