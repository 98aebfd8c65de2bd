#!/usr/bin/env python
"""Training-log analysis (reference tools/analysis_tools/analyze_logs.py):
plot metric curves from the jsonl log or compute average iteration time."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from gkgnet_tpu.utils.logging import load_json_log


def cal_train_time(log_dict, args):
    for epoch, bucket in sorted(log_dict.items()):
        times = bucket.get("time", [])
        if len(times) < 2:
            continue
        import numpy as np

        deltas = np.diff(times)
        print(f"epoch {epoch}: avg iter window {deltas.mean():.4f}s "
              f"min {deltas.min():.4f} max {deltas.max():.4f}")


def plot_curve(log_dicts, args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for log_dict, path in zip(log_dicts, args.json_logs):
        for key in args.keys:
            xs, ys = [], []
            for epoch, bucket in sorted(log_dict.items()):
                vals = bucket.get(key, [])
                iters = bucket.get("iter", list(range(len(vals))))
                for it, v in zip(iters, vals):
                    xs.append((epoch - 1) * (max(iters) if iters else 1) + it)
                    ys.append(v)
            if xs:
                plt.plot(xs, ys, label=f"{os.path.basename(path)}:{key}")
    plt.legend()
    plt.xlabel("iter")
    plt.savefig(args.out or "curve.png", dpi=150)
    print(f"saved {args.out or 'curve.png'}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="task", required=True)
    pc = sub.add_parser("plot_curve")
    pc.add_argument("json_logs", nargs="+")
    pc.add_argument("--keys", nargs="+", default=["loss"])
    pc.add_argument("--out", default=None)
    ct = sub.add_parser("cal_train_time")
    ct.add_argument("json_logs", nargs="+")
    args = p.parse_args()

    log_dicts = [load_json_log(path) for path in args.json_logs]
    if args.task == "cal_train_time":
        for d in log_dicts:
            cal_train_time(d, args)
    else:
        plot_curve(log_dicts, args)


if __name__ == "__main__":
    main()
