#!/usr/bin/env python
"""Visualize augmented training samples (reference
tools/visualizations/vis_pipeline.py): run the train pipeline on a few
dataset images and save a grid."""

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
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--number", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="pipeline_samples.png")
    p.add_argument("--skip-normalize", action="store_true", default=True)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from gkgnet_tpu.core.builder import build_dataset
    from gkgnet_tpu.core.config import Config
    from gkgnet_tpu.data.pipelines import Compose, Normalize, build_pipeline

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg.data[args.split])
    # unwrap wrapper datasets (ClassBalanced/Repeat) to reach the pipeline
    inner = ds_cfg
    while "pipeline" not in inner and "dataset" in inner:
        inner = inner["dataset"]
    inner["pipeline"] = [
        c for c in inner["pipeline"]
        if not (args.skip_normalize and c["type"] == "Normalize")]
    ds = build_dataset(ds_cfg)

    imgs = []
    for i in range(min(args.number, len(ds))):
        out = ds.prepare_data(i, np.random.default_rng((args.seed, i)))
        img = out["img"]
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        imgs.append(img)
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    cols = min(4, len(imgs))
    rows = -(-len(imgs) // cols)
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h:r * h + img.shape[0], c * w:c * w + img.shape[1]] = img
    Image.fromarray(grid).save(args.out)
    print(f"saved {len(imgs)} samples -> {args.out}")


if __name__ == "__main__":
    main()
