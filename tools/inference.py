#!/usr/bin/env python
"""Single-image inference API + CLI (reference mmcls/apis/inference.py:
init_model / inference_model / show_result_pyplot, multi-label aware)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_model(config_path: str, checkpoint: str | None = None):
    """Build (model, state, cfg) ready for inference."""
    import jax
    import jax.numpy as jnp
    import optax

    from gkgnet_tpu.core.builder import build_model
    from gkgnet_tpu.core.checkpoint import restore_checkpoint
    from gkgnet_tpu.core.config import Config
    from gkgnet_tpu.core.trainer import create_train_state

    cfg = Config.fromfile(config_path)
    model = build_model(cfg.model)
    size = cfg.model["size"]
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)), optax.sgd(1e-3))
    if checkpoint:
        raw, _, _ = restore_checkpoint(checkpoint)
        state = state.replace(
            params=raw["params"],
            batch_stats=raw.get("batch_stats") or state.batch_stats,
            constants=raw.get("constants") or state.constants,
        )
    return model, state, cfg


def inference_model(model, state, cfg, img_path: str, topk: int = 5):
    """Run the test pipeline + forward on one image; returns per-class
    scores and the top-k (class, name, score) predictions."""
    import jax
    import numpy as np

    from gkgnet_tpu.core.trainer import make_eval_step
    from gkgnet_tpu.data.coco import COCO_CLASSES
    from gkgnet_tpu.data.pipelines import build_pipeline

    pipeline = build_pipeline(cfg.data["test"]["pipeline"])
    results = pipeline({"img_prefix": "", "img_info": {"filename": img_path}},
                       np.random.default_rng(0))
    imgs = results["img"][None]
    eval_step = make_eval_step(model)
    scores = np.asarray(jax.device_get(eval_step(state, imgs)))[0]
    order = np.argsort(-scores)[:topk]
    classes = getattr(cfg, "classes", None) or COCO_CLASSES
    preds = [{"class_id": int(i),
              "class_name": classes[i] if i < len(classes) else str(i),
              "score": float(scores[i])} for i in order]
    return scores, preds


def show_result(img_path: str, preds, out_file: str | None = None):
    """Draw prediction text onto the image (reference
    core/visualization/image.py imshow_infos)."""
    from gkgnet_tpu.utils.visualization import imshow_predictions

    return imshow_predictions(img_path, preds, out_file=out_file)


def main():
    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser(description="GKGNet-TPU single-image inference")
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--out-image")
    args = p.parse_args()

    model, state, cfg = init_model(args.config, args.checkpoint)
    scores, preds = inference_model(model, state, cfg, args.img, args.topk)
    print(json.dumps(preds, indent=2))
    if args.out_image:
        show_result(args.img, preds, args.out_image)


if __name__ == "__main__":
    main()
