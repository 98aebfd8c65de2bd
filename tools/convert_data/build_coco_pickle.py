#!/usr/bin/env python
"""Build the COCO multi-label pickle annotation file from a standard
``instances_*.json`` — produces the exact format the reference consumes
(datasets/coco.py:269-291: a pickled list of
{"objects": multi-hot (80,), "file_name": str})."""

from __future__ import annotations

import argparse
import json
import pickle

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("instances_json", help="e.g. instances_train2014.json")
    p.add_argument("out", help="e.g. train.data")
    p.add_argument("--with-area", action="store_true",
                   help="also store per-class max object area (for mAP_area)")
    args = p.parse_args()

    with open(args.instances_json) as f:
        coco = json.load(f)

    cat_ids = sorted(c["id"] for c in coco["categories"])
    cat_to_idx = {cid: i for i, cid in enumerate(cat_ids)}
    n_classes = len(cat_ids)
    print(f"{n_classes} categories, {len(coco['images'])} images, "
          f"{len(coco['annotations'])} annotations")

    per_image: dict[int, np.ndarray] = {}
    per_image_area: dict[int, np.ndarray] = {}
    for ann in coco["annotations"]:
        img_id = ann["image_id"]
        ci = cat_to_idx[ann["category_id"]]
        vec = per_image.setdefault(
            img_id, np.zeros(n_classes, dtype=np.int8))
        vec[ci] = 1
        if args.with_area:
            areas = per_image_area.setdefault(
                img_id, np.zeros(n_classes, dtype=np.float64))
            areas[ci] = max(areas[ci], float(ann.get("area", 0)))

    records = []
    for img in coco["images"]:
        rec = {
            "objects": per_image.get(
                img["id"], np.zeros(n_classes, dtype=np.int8)),
            "file_name": img["file_name"],
        }
        if args.with_area:
            rec["area"] = per_image_area.get(
                img["id"], np.zeros(n_classes, dtype=np.float64))
        records.append(rec)

    with open(args.out, "wb") as f:
        pickle.dump(records, f)
    n_pos = sum(int(r["objects"].sum()) for r in records)
    print(f"wrote {len(records)} records ({n_pos} positive labels) -> {args.out}")


if __name__ == "__main__":
    main()
