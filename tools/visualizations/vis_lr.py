#!/usr/bin/env python
"""Simulate + plot the LR schedule (reference tools/visualizations/vis_lr.py)."""

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
    p.add_argument("--steps-per-epoch", type=int, default=1000)
    p.add_argument("--out", default="lr_schedule.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from gkgnet_tpu.core.config import Config
    from gkgnet_tpu.core.schedules import build_lr_schedule

    cfg = Config.fromfile(args.config)
    lr_cfg = dict(cfg.lr_config)
    lr_cfg["base_lr"] = cfg.optimizer["lr"]
    sched = build_lr_schedule(lr_cfg, args.steps_per_epoch)
    total = cfg["runner"]["max_epochs"] * args.steps_per_epoch
    xs = np.arange(0, total, max(total // 2000, 1))
    ys = [float(sched(x)) for x in xs]
    plt.plot(xs / args.steps_per_epoch, ys)
    plt.xlabel("epoch")
    plt.ylabel("lr")
    plt.yscale("log")
    plt.savefig(args.out, dpi=150)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
