#!/usr/bin/env python
"""Inspect best/worst predictions from a dumped results file (reference
tools/analysis_tools/analyze_results.py): ranks images by prediction
quality and writes the top-k success/failure cases."""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="pickle of (N, C) scores")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--out", default="analysis.json")
    args = p.parse_args()

    import numpy as np

    from gkgnet_tpu.core.builder import build_dataset
    from gkgnet_tpu.core.config import Config

    cfg = Config.fromfile(args.config)
    with open(args.results, "rb") as f:
        scores = np.asarray(pickle.load(f))
    ds = build_dataset(cfg.data["test"])
    gt = ds.get_gt_labels().astype(np.float64)

    # per-image quality: mean binary correctness at thr 0.5
    pred = (scores >= 0.5).astype(np.float64)
    quality = (pred == gt).mean(axis=1)
    order = np.argsort(quality)
    classes = list(getattr(ds, "CLASSES", []))

    def describe(i):
        i = int(i)
        pos = [classes[c] if classes else c for c in np.where(gt[i] == 1)[0]]
        hits = [classes[c] if classes else c
                for c in np.where((pred[i] == 1) & (gt[i] == 1))[0]]
        false_pos = [classes[c] if classes else c
                     for c in np.where((pred[i] == 1) & (gt[i] == 0))[0]]
        return {"index": i,
                "file": ds.data_infos[i]["img_info"]["filename"]
                if hasattr(ds, "data_infos") else None,
                "quality": float(quality[i]),
                "gt": pos, "hits": hits, "false_positives": false_pos}

    report = {
        "worst": [describe(i) for i in order[: args.topk]],
        "best": [describe(i) for i in order[::-1][: args.topk]],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"mean per-image quality {quality.mean():.4f}; "
          f"report -> {args.out}")


if __name__ == "__main__":
    main()
