#!/usr/bin/env python
"""Label->patch edge visualization — the feature the reference left as
commented-out experiments in apis/test.py:71-257: for each (or one) class,
overlay the patches its label token attends to through the final cross-graph
k-NN onto the input image."""

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
    p.add_argument("--classes", type=int, nargs="+", default=None,
                   help="class ids to draw (default: top-3 predictions)")
    p.add_argument("--out", default="edges.png")
    args = p.parse_args()

    import jax
    import numpy as np
    from PIL import Image, ImageDraw

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from inference import init_model  # tools/inference.py

    from gkgnet_tpu.data.coco import COCO_CLASSES
    from gkgnet_tpu.data.pipelines import build_pipeline

    model, state, cfg = init_model(args.config, args.checkpoint)
    pipeline = build_pipeline(cfg.data["test"]["pipeline"])
    results = pipeline({"img_prefix": "", "img_info": {"filename": args.img}},
                       np.random.default_rng(0))
    imgs = results["img"][None]

    @jax.jit
    def fwd(state, imgs):
        cls_score, edge = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "constants": state.constants}, imgs, train=False)
        return jax.nn.sigmoid(cls_score), edge

    scores, edges = jax.device_get(fwd(state, imgs))
    scores, edges = np.asarray(scores)[0], np.asarray(edges)
    # edges: (num_group, L, k) for batch 1 — indices into the final grid
    size = cfg.model["size"]
    grid = size // 32  # stage-4 resolution
    class_ids = args.classes or list(np.argsort(-scores)[:3])

    with Image.open(args.img) as im:
        im = im.convert("RGB").resize((size, size))
    draw = ImageDraw.Draw(im)
    colors = [(255, 64, 64), (64, 255, 64), (64, 128, 255), (255, 255, 0)]
    cell = size // grid
    for ci, cls in enumerate(class_ids):
        color = colors[ci % len(colors)]
        for gidx in range(edges.shape[0]):
            for patch in edges[gidx, cls]:
                r, c = divmod(int(patch), grid)
                draw.rectangle([c * cell, r * cell, (c + 1) * cell,
                                (r + 1) * cell], outline=color, width=2)
        name = COCO_CLASSES[cls] if cls < len(COCO_CLASSES) else str(cls)
        draw.text((4, 4 + 14 * ci), f"{name}: {scores[cls]:.3f}", fill=color)
    im.save(args.out)
    print(f"saved {args.out} (classes {class_ids})")


if __name__ == "__main__":
    main()
