#!/usr/bin/env python
"""Per-transform host-pipeline cost profile (VERDICT r4 next-#2).

Measures, on THIS machine (no device involved):
  1. per-transform ms/sample over the flagship train stack, including
     JPEG decode, on the same synthetic 640x480 JPEGs bench.py uses;
  2. a finer split of CropMixup (decode-free): crop+resize views vs
     blend passes vs uint8 round-trip;
  3. end-to-end loader img/s at 1/2/4 workers, threads vs processes.

Usage: python tools/profile_loader.py [--quick]
"""
import argparse
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from gkgnet_tpu.data.coco import CocoMultiLabel
from gkgnet_tpu.data.loader import build_dataloader
from gkgnet_tpu.data.pipelines import build_pipeline

PIPE_CFG = [
    dict(type="LoadImageFromFile"),
    dict(type="CropMixup", size=576, p=0.5),
    dict(type="RandomFlip", flip_prob=0.5),
    dict(type="RandomErasing", erase_prob=0.2),
    dict(type="ColorJitter", brightness=0.4, contrast=0.4, saturation=0.4),
    dict(type="Trivial"),
    dict(type="Normalize",
         mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
    dict(type="Collect", keys=["img", "gt_label"]),
]


def make_fixture(tmp, n_img=64):
    rng = np.random.default_rng(0)
    ann = []
    for i in range(n_img):
        arr = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        name = f"im{i}.jpg"
        Image.fromarray(arr).save(os.path.join(tmp, name), quality=90)
        objs = np.zeros(80, np.float32)
        objs[rng.integers(0, 80, 3)] = 1
        ann.append({"file_name": name, "objects": objs})
    ann_file = os.path.join(tmp, "ann.pkl")
    with open(ann_file, "wb") as f:
        pickle.dump(ann, f)
    return ann_file


def per_transform(tmp, ann_file, n_samples):
    """Run the pipeline sample-by-sample, timing each transform."""
    pipeline = build_pipeline(PIPE_CFG)
    with open(ann_file, "rb") as f:
        ann = pickle.load(f)
    names = [c["type"] for c in PIPE_CFG]
    totals = np.zeros(len(pipeline.transforms))
    # p-gated transforms: also track the active-branch cost
    active_ms = {i: [] for i in range(len(pipeline.transforms))}
    for s in range(n_samples):
        rng = np.random.default_rng((0, 0, s))
        info = ann[s % len(ann)]
        results = {"img_prefix": tmp,
                   "img_info": dict(filename=info["file_name"]),
                   "gt_label": np.asarray(info["objects"], np.float32)}
        for i, t in enumerate(pipeline.transforms):
            t0 = time.perf_counter()
            results = t(results, rng=rng)
            dt = (time.perf_counter() - t0) * 1e3
            totals[i] += dt
            active_ms[i].append(dt)
    print(f"\n-- per-transform cost ({n_samples} samples, 640x480 JPEG "
          f"-> 576² train stack, single thread) --")
    print(f"  {'transform':20s} {'mean ms':>8s} {'p90 ms':>8s} {'share':>6s}")
    tot = totals.sum()
    for i, name in enumerate(names):
        a = np.asarray(active_ms[i])
        print(f"  {name:20s} {totals[i] / n_samples:8.2f} "
              f"{np.percentile(a, 90):8.2f} {100 * totals[i] / tot:5.1f}%")
    print(f"  {'TOTAL':20s} {tot / n_samples:8.2f}  -> "
          f"{1e3 / (tot / n_samples):.1f} img/s/core")


def cropmix_split(tmp, ann_file, n_samples):
    """Decompose CropMixup (current uint8 + native mix_chain flow):
    views (PIL crop+resize) vs the fused blend chain."""
    from gkgnet_tpu.data.pipelines import CropMixup
    from gkgnet_tpu.native import mix_chain

    cm = CropMixup(p=1.0, size=576)
    img = np.asarray(Image.open(os.path.join(tmp, "im0.jpg")).convert("RGB"))
    t_views = t_blend = 0.0
    for s in range(n_samples):
        rng = np.random.default_rng((1, s))
        n = int(rng.choice([2, 3, 4]))
        t0 = time.perf_counter()
        views = cm._views(img, n, rng)
        t1 = time.perf_counter()
        order = rng.permutation(n)
        plan = []
        for _ in order[1:]:
            lam = float(rng.beta(cm.mix_ratio / n, cm.mix_ratio / n))
            perm = rng.permutation(3)
            plan.append((lam, 1 if lam > 0.5 else 2, *map(int, perm)))
        out = mix_chain([views[i] for i in order], plan)
        t2 = time.perf_counter()
        t_views += t1 - t0
        t_blend += t2 - t1
        del out
    print(f"\n-- CropMixup split ({n_samples} samples, p=1, mean n=3) --")
    print(f"  views (n x PIL crop+resize):      {t_views / n_samples * 1e3:7.2f} ms")
    print(f"  fused native blend chain + store: {t_blend / n_samples * 1e3:7.2f} ms")


def end_to_end(tmp, ann_file, batch=8, epochs=3):
    ds = CocoMultiLabel(ann_file=ann_file, data_prefix=tmp,
                        pipeline=build_pipeline(PIPE_CFG))
    print(f"\n-- end-to-end loader img/s (batch {batch}) --")
    for workers in (1, 2, 4):
        for mode in ("threads", "processes"):
            loader = build_dataloader(ds, batch, workers, num_replicas=1,
                                      rank=0, shuffle=True, seed=0,
                                      drop_last=True, mode=mode)
            loader.set_epoch(0)
            for _ in loader:  # warmup (spawn pool, warm caches)
                pass
            t0 = time.perf_counter()
            n = 0
            for e in range(1, 1 + epochs):
                loader.set_epoch(e)
                for b in loader:
                    n += b["img"].shape[0]
            dt = time.perf_counter() - t0
            print(f"  workers={workers} {mode:10s}: {n / dt:7.1f} img/s")
            loader.shutdown() if hasattr(loader, "shutdown") else None


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()
    n = 48 if args.quick else 160
    tmp = tempfile.mkdtemp(prefix="profile_loader_")
    ann_file = make_fixture(tmp)
    per_transform(tmp, ann_file, n)
    cropmix_split(tmp, ann_file, max(24, n // 4))
    if not args.skip_e2e:
        end_to_end(tmp, ann_file, epochs=2 if args.quick else 3)
