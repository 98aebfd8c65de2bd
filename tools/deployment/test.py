#!/usr/bin/env python
"""Evaluate an EXPORTED model artifact through the same eval harness as the
native checkpoint path (reference tools/deployment/test.py: run ONNX/TRT
backends through `single_gpu_test` + `dataset.evaluate`).

Usage:
  python tools/deployment/test.py CONFIG ARTIFACT [--backend stablehlo|savedmodel]
         [--out scores.pkl] [--metrics-out metrics.json]

ARTIFACT is a StableHLO file written by tools/deployment/export.py
(--format stablehlo) or a SavedModel directory (--format savedmodel).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("artifact")
    p.add_argument("--backend", choices=["auto", "stablehlo", "savedmodel"],
                   default="auto")
    p.add_argument("--out", help="dump raw scores (pickle)")
    p.add_argument("--metrics-out", help="dump metric dict (json)")
    args = p.parse_args()

    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    import numpy as np

    from gkgnet_tpu.core.builder import build_dataset
    from gkgnet_tpu.core.config import Config
    from gkgnet_tpu.core.export import load_exported_classifier
    from gkgnet_tpu.data.loader import build_dataloader
    from gkgnet_tpu.utils.logging import get_logger

    logger = get_logger()
    cfg = Config.fromfile(args.config)
    clf = load_exported_classifier(args.artifact, args.backend)
    batch = clf.batch
    logger.info(f"loaded {args.backend} artifact, input {clf.input_shape}")

    test_ds = build_dataset(cfg.data["test"])
    loader = build_dataloader(test_ds, batch, cfg.data.get("workers", 8),
                              shuffle=False, drop_last=False)
    chunks = []
    for i, b in enumerate(loader):
        imgs = b["img"]
        pad = batch - imgs.shape[0]
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
        scores = clf(np.ascontiguousarray(imgs))
        chunks.append(scores[: batch - pad] if pad else scores)
        if (i + 1) % 10 == 0:
            logger.info(f"{(i + 1) * batch}/{len(test_ds)}")
    results = np.concatenate(chunks, 0)

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"dumped scores to {args.out}")

    metrics = test_ds.evaluate(results, logger=logger)
    print(json.dumps(metrics, indent=2))
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
