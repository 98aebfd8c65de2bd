#!/usr/bin/env python
"""FLOPs/params report (reference tools/analysis_tools/get_flops.py, using
XLA's own cost analysis instead of an mmcv hook-based counter)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def count_flops(model, variables, x) -> dict:
    import jax

    lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, x)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return dict(analysis or {})


def main():
    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--shape", type=int, nargs="+", default=[576, 576])
    p.add_argument("--arch", default="s")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    if args.config:
        from gkgnet_tpu.core.builder import build_model
        from gkgnet_tpu.core.config import Config

        cfg = Config.fromfile(args.config)
        model = build_model(cfg.model)
        size = cfg.model["size"]
    else:
        size = args.shape[0]
        model = GKGNetClassifier(arch=args.arch, size=size)

    x = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    n_params = sum(np.prod(np.shape(l))
                   for l in jax.tree.leaves(variables["params"]))
    analysis = count_flops(model, variables, x)
    flops = analysis.get("flops", float("nan"))
    print("=" * 30)
    print(f"Input shape: (1, {size}, {size}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (XLA cost analysis): {flops / 1e9:.2f} G")
    for key in ("bytes accessed", "transcendentals"):
        if key in analysis:
            print(f"{key}: {analysis[key]:.3e}")
    print("=" * 30)


if __name__ == "__main__":
    main()
