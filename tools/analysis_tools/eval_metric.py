#!/usr/bin/env python
"""Re-evaluate dumped results offline (reference
tools/analysis_tools/eval_metric.py): takes the pickle written by
tools/test.py --out and recomputes the metric dict without a model."""

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
    p.add_argument("results", help="pickle of (N, C) scores from test.py --out")
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    from gkgnet_tpu.core.builder import build_dataset
    from gkgnet_tpu.core.config import Config, parse_cfg_option

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options({
        k: parse_cfg_option(v) for k, v in
        (o.split("=", 1) for o in args.cfg_options)})
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    dataset = build_dataset(cfg.data["test"])
    print(json.dumps(dataset.evaluate(results), indent=2))


if __name__ == "__main__":
    main()
