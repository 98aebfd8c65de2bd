#!/usr/bin/env python
"""FLOPs/params report (reference tools/analysis_tools/get_flops.py).

Default is the closed-form analytic counter (the model is convs/matmuls end
to end — exact, answers in seconds on any host). ``--verify`` additionally
compiles the model and cross-checks against XLA's own cost analysis (slow:
a full-model compile).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def count_flops_xla(model, variables, x) -> dict:
    import jax

    lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(
        variables, x)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return dict(analysis or {})


def count_params(arch: str, size: int, n_classes: int = 80) -> int:
    """Parameter count without building the model (init on CPU is slow for
    576^2 inputs); falls back to model.init if the geometry is unusual."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    # params are input-size independent except pos_embed: init at a small
    # size and correct the pos_embed term analytically.
    small = 224
    model = GKGNetClassifier(arch=arch, size=small, n_classes=n_classes)
    x = jnp.zeros((1, small, small, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree.leaves(variables["params"]))
    from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS
    c0 = ARCH_SETTINGS[arch]["channels"][0]
    n += ((size // 4) ** 2 - (small // 4) ** 2) * c0  # pos_embed delta
    return n


def main():
    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--shape", type=int, nargs="+", default=[576, 576])
    p.add_argument("--arch", default="s")
    p.add_argument("--verify", action="store_true",
                   help="cross-check against XLA cost analysis (compiles "
                        "the full model — minutes)")
    p.add_argument("--impl", action="store_true",
                   help="also report executed flops on the fused-kernel "
                        "path (adds the one-hot gather matmuls)")
    args = p.parse_args()

    from gkgnet_tpu.utils.profiling import model_flops

    arch, size, n_classes, num_gcn, k = args.arch, args.shape[0], 80, 1, 9
    if args.config:
        from gkgnet_tpu.core.config import Config

        cfg = Config.fromfile(args.config)
        arch = cfg.model.get("arch", "s")
        size = cfg.model["size"]
        n_classes = cfg.model.get("n_classes", 80)
        num_gcn = cfg.model.get("num_gcn", 1)
        k = cfg.model.get("k", 9)

    fl = model_flops(arch, size, 1, k=k, n_classes=n_classes,
                     num_gcn=num_gcn)
    n_params = count_params(arch, size, n_classes)
    print("=" * 30)
    print(f"Input shape: (1, {size}, {size}, 3)   arch={arch}")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (analytic): {fl['per_image_total'] / 1e9:.2f} G")
    for key, v in fl.items():
        if key not in ("total", "per_image_total"):
            print(f"  {key:>14}: {v / 1e9:8.2f} G")
    if args.impl:
        fi = model_flops(arch, size, 1, k=k, n_classes=n_classes,
                         num_gcn=num_gcn, count_impl=True)
        print(f"FLOPs (executed, fused-gather path): "
              f"{fi['per_image_total'] / 1e9:.2f} G")
    if args.verify:
        import jax
        import jax.numpy as jnp

        from gkgnet_tpu.nn.classifier import GKGNetClassifier

        model = GKGNetClassifier(arch=arch, size=size, n_classes=n_classes,
                                 num_gcn=num_gcn, k=k)
        x = jnp.zeros((1, size, size, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        analysis = count_flops_xla(model, variables, x)
        flops = analysis.get("flops", float("nan"))
        print(f"FLOPs (XLA cost analysis): {flops / 1e9:.2f} G "
              f"(ratio {flops / fl['per_image_total']:.3f})")
    print("=" * 30)


if __name__ == "__main__":
    main()
