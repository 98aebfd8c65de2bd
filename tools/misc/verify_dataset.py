#!/usr/bin/env python
"""Decode every image in a dataset to catch corruption (reference
tools/misc/verify_dataset.py)."""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train", choices=["train", "val", "test"])
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--out", default="broken_files.txt")
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from gkgnet_tpu.core.builder import build_dataset
    from gkgnet_tpu.core.config import Config

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg.data[args.split])
    ds_cfg["pipeline"] = None
    ds = build_dataset(ds_cfg)
    base = ds
    while not hasattr(base, "filepath"):
        base = base.dataset

    def check(i):
        path = base.filepath(i)
        try:
            with Image.open(path) as im:
                np.asarray(im.convert("RGB"))
            return None
        except Exception as e:
            return f"{path}\t{type(e).__name__}: {e}"

    broken = []
    with ThreadPoolExecutor(args.workers) as pool:
        for i, res in enumerate(pool.map(check, range(len(base)))):
            if res:
                broken.append(res)
            if (i + 1) % 1000 == 0:
                print(f"{i + 1}/{len(base)} checked, {len(broken)} broken")
    if broken:
        with open(args.out, "w") as f:
            f.write("\n".join(broken))
        print(f"{len(broken)} broken files -> {args.out}")
        sys.exit(1)
    print("all images decodable")


if __name__ == "__main__":
    main()
