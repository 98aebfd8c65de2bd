#!/usr/bin/env python
"""Render the fully-resolved config (reference tools/misc/print_config.py)."""

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
    p.add_argument("--cfg-options", nargs="+", default=[])
    args = p.parse_args()

    from gkgnet_tpu.core.config import Config, parse_cfg_option

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options({
        k: parse_cfg_option(v) for k, v in
        (o.split("=", 1) for o in args.cfg_options)})
    print(cfg.pretty_text())


if __name__ == "__main__":
    main()
