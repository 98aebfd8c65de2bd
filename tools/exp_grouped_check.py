#!/usr/bin/env python
"""On-hardware validation + timing of the fold-aware grouped kernels
(knn_mr_fused_grouped) vs fold -> knn_mr_fused -> unfold, at production
shapes. Run BEFORE bench in a TPU batch: if this fails or mismatches,
set GKGNET_NO_GROUPED=1 for the rest of the batch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from gkgnet_tpu.ops.pallas.knn_mr import (_fold_g, _unfold_g,
                                              knn_mr_fused,
                                              knn_mr_fused_grouped)
    from gkgnet_tpu.ops.pos_embed import get_relative_pos_table

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    # (name, B, g, N, M, D, k, dil, bias)
    cases = [
        ("stage1", 8, 2, 20736, 1296, 40, 9, 1, True),
        ("stage2", 8, 2, 5184, 1296, 80, 9, 1, True),
        ("stage3/d2", 8, 2, 1296, 1296, 200, 9, 2, True),
        ("stage4/d3", 8, 2, 324, 324, 320, 9, 3, True),
        ("label1", 8, 2, 80, 20736, 40, 9, 1, False),
    ]
    ok_all = True
    for name, B, g, N, M, D, k, dil, bias_on in cases:
        x = jnp.asarray(rng.standard_normal((B, N, g * D)), jnp.bfloat16)
        y = jnp.asarray(rng.standard_normal((B, M, g * D)), jnp.bfloat16)
        bias = None
        if bias_on:
            bias = jnp.asarray(
                get_relative_pos_table(g * D, N, int(round((N / M) ** 0.5)))
                if N != M else
                get_relative_pos_table(g * D, N, 1), jnp.float32)

        fg = jax.jit(lambda a, b: knn_mr_fused_grouped(a, b, bias, k, dil, g))
        ff = jax.jit(lambda a, b: knn_mr_fused(a, b, bias, k, dil))

        idx_g, mr_g = jax.block_until_ready(fg(x, y))
        xf, yf = _fold_g(x, g), _fold_g(y, g)
        idx_f, mr_f = jax.block_until_ready(ff(xf, yf))
        mr_ref = _unfold_g(mr_f, g)
        idx_ref = idx_f.reshape(B, g, N, k).transpose(0, 2, 1, 3)
        ok_i = bool(jnp.array_equal(idx_g, idx_ref))
        ok_m = bool(jnp.array_equal(mr_g, mr_ref))
        ok_all &= ok_i and ok_m

        def t(fn, *args, iters=5):
            fn(*args)[1].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            out[1].block_until_ready()
            return (time.perf_counter() - t0) / iters * 1e3

        tg = t(fg, x, y)
        tf = t(ff, xf, yf)
        print(f"  {name:10s}: grouped idx_bitwise={ok_i} mr_bitwise={ok_m} "
              f"| grouped {tg:.2f} ms vs folded-kernel-only {tf:.2f} ms",
              flush=True)
    print("GROUPED_OK" if ok_all else "GROUPED_MISMATCH", flush=True)


if __name__ == "__main__":
    main()
