#!/usr/bin/env python
"""Convert a reference GKGNet torch checkpoint (.pth) to this framework's
orbax params checkpoint (reference analog: tools/convert_models/*)."""

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
    p.add_argument("torch_checkpoint")
    p.add_argument("config")
    p.add_argument("out_dir")
    p.add_argument("--partial", action="store_true",
                   help="non-strict import (reference gkgnet.py:255-261): "
                        "keys absent from the torch checkpoint keep their "
                        "fresh init; prints a loaded/missing/unused report. "
                        "Use for the ImageNet pvig_s backbone bootstrap.")
    p.add_argument("--prefix", default="",
                   help="prepend to every torch key before mapping (pvig_s "
                        "backbone-only checkpoints need --prefix backbone.)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gkgnet_tpu.core.builder import build_model
    from gkgnet_tpu.core.checkpoint import save_checkpoint
    from gkgnet_tpu.core.config import Config
    from gkgnet_tpu.utils.torch_convert import (
        convert_reference_checkpoint, load_torch_checkpoint)

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model)
    size = cfg.model["size"]
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False))()
    sd = load_torch_checkpoint(args.torch_checkpoint)
    if args.prefix:
        sd = {args.prefix + k: v for k, v in sd.items()}
    report: dict = {}
    converted = convert_reference_checkpoint(
        sd, jax.device_get(variables), strict=not args.partial,
        report=report if args.partial else None)
    if args.partial:
        print(f"partial import: {len(report['loaded'])} loaded, "
              f"{len(report['missing'])} kept at init, "
              f"{len(report['mismatched'])} shape-mismatched, "
              f"{len(report['unused'])} torch keys unused")
        for kind in ("mismatched", "unused"):
            for item in report[kind][:20]:
                print(f"  {kind}: {item}")
    save_checkpoint(args.out_dir,
                    {"params": converted["params"],
                     "batch_stats": converted["batch_stats"]},
                    epoch=0, meta={"source": args.torch_checkpoint,
                                   "partial": args.partial})
    print(f"converted -> {args.out_dir}")


if __name__ == "__main__":
    main()
