#!/usr/bin/env python
"""Round-4 kernel experiments on the real chip (run under `timeout`, one
process, measurements batched — fresh-process backend init costs ~400 s
through the axon tunnel):

  1. tile_n sweep for the stage-1/2 fused kernels (larger query tiles
     amortize per-tile fold/matmul-issue overhead; VMEM model gates).
  2. gather-tax variants at the MXU-bound stage-3/4 shapes (VERDICT r3
     next-#4): fully-fused one-hot-matmul gather vs Pallas-selection
     (knn_topk) + XLA take_along_axis gather.
  3. zero-vs-random worst case of the redesigned tie path at stage-1 and
     label-1 geometry (VERDICT r3 next-#1 contract: in-round tie fix, no
     whole-tile epilogue).

Usage: python tools/exp_round4.py [tiles|gather|ties ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gkgnet_tpu.ops.aggregate import max_relative
from gkgnet_tpu.ops.knn import dilate_edges, l2_normalize
from gkgnet_tpu.ops.pallas.knn_mr import knn_mr_fused
from gkgnet_tpu.ops.pallas.knn_topk import knn_topk


def bench(fn, *args, iters=20):
    @jax.jit
    def run(eps, *a):
        def body(c, e):
            out = fn(a[0] + e, *a[1:])
            leaves = jax.tree.leaves(out)
            return (c + sum(jnp.sum(t).astype(jnp.float32)
                            for t in leaves)), None
        return jax.lax.scan(body, jnp.float32(0), eps)[0]

    def timed(n):
        eps = jnp.zeros((n,), args[0].dtype)
        np.asarray(run(eps, *args))
        t0 = time.perf_counter()
        np.asarray(run(eps, *args))
        return time.perf_counter() - t0

    for _ in range(2):
        t3, t1 = timed(3 * iters), timed(iters)
        if t3 > t1 > 0:
            return (t3 - t1) / (2 * iters)
    return timed(3 * iters) / (3 * iters)


CASES = {
    # name: (bg, n, d, m, k, dil, bias)
    "stage1": (16, 20736, 40, 1296, 9, 1, True),
    "stage2": (16, 5184, 80, 1296, 9, 1, True),
    "stage3/d2": (16, 1296, 200, 1296, 9, 2, True),
    "stage3/d3": (16, 1296, 200, 1296, 9, 3, True),
    "stage4/d3": (16, 324, 320, 324, 9, 3, True),
    "label1": (16, 80, 40, 20736, 9, 1, False),
}


def make(case, dtype=jnp.bfloat16, seed=0):
    bg, n, d, m, k, dil, has_bias = CASES[case]
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bg, n, d)), dtype)
    y = jnp.asarray(rng.standard_normal((bg, m, d)), dtype)
    bias = (jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32)
            if has_bias else None)
    return x, y, bias, k, dil


def run_tiles():
    print("== tile_n sweep ==", flush=True)
    for case in ("stage1", "stage2", "stage3/d2"):
        x, y, bias, k, dil = make(case)
        for tile in (128, 256, 512, 1024):
            if tile > x.shape[1]:
                continue
            from gkgnet_tpu.ops.pallas.knn_mr import fused_fits
            if not fused_fits(x.shape[1], y.shape[1], k, dil, tile,
                              d=x.shape[2], itembytes=2):
                print(f"  {case} tile={tile}: VMEM gate", flush=True)
                continue
            t = bench(lambda a, b, bias=bias, k=k, dil=dil, tile=tile:
                      knn_mr_fused(a, b, bias, k, dil, tile), x, y)
            print(f"  {case} tile={tile}: {t*1e3:7.2f} ms", flush=True)


def run_gather():
    print("== gather-tax variants (MXU-bound stages) ==", flush=True)
    for case in ("stage3/d2", "stage3/d3", "stage4/d3", "stage2"):
        x, y, bias, k, dil = make(case)

        def fused(a, b, bias=bias, k=k, dil=dil):
            return knn_mr_fused(a, b, bias, k, dil)

        def topk_xla_gather(a, b, bias=bias, k=k, dil=dil):
            xn = l2_normalize(jax.lax.stop_gradient(a))
            yn = l2_normalize(jax.lax.stop_gradient(b))
            idx = knn_topk(xn, yn, k=k * dil, bias=bias)
            idx = dilate_edges(idx, dilation=dil)
            return idx, max_relative(a, idx, b)

        t_f = bench(fused, x, y)
        t_g = bench(topk_xla_gather, x, y)
        # parity spot check
        i_f, mr_f = jax.jit(fused)(x, y)
        i_g, mr_g = jax.jit(topk_xla_gather)(x, y)
        match = float((np.asarray(i_f) == np.asarray(i_g)).mean())
        print(f"  {case}: fused {t_f*1e3:6.2f} ms | topk+XLA-gather "
              f"{t_g*1e3:6.2f} ms | idx match {match:.4f}", flush=True)


def run_ties():
    print("== zero-vs-random tie worst case (redesigned tie path) ==",
          flush=True)
    for case in ("stage1", "label1", "stage3/d2"):
        x, y, bias, k, dil = make(case)
        t_rand = bench(lambda a, b, bias=bias, k=k, dil=dil:
                       knn_mr_fused(a, b, bias, k, dil), x, y)
        xz, yz = jnp.zeros_like(x), jnp.zeros_like(y)
        bz = jnp.zeros_like(bias) if bias is not None else None
        t_zero = bench(lambda a, b, bz=bz, k=k, dil=dil:
                       knn_mr_fused(a, b, bz, k, dil), xz, yz)
        print(f"  {case}: random {t_rand*1e3:6.2f} ms | all-ties "
              f"{t_zero*1e3:6.2f} ms | ratio {t_zero/t_rand:.2f}x",
              flush=True)


def run_shardmap():
    """graph=1-on-mesh overhead on one real chip: the edge-partitioned
    shard_map path (which the model takes whenever a graph axis is
    active) vs the bare fused kernel (VERDICT r3 weak #7)."""
    from gkgnet_tpu.parallel.edge_partition import edge_partitioned_knn_mr
    from gkgnet_tpu.parallel.mesh import make_mesh

    print("== single-chip shard_map(graph=1) overhead ==", flush=True)
    mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
    for case in ("stage1", "stage3/d2"):
        x, y, bias, k, dil = make(case)
        t_bare = bench(lambda a, b, bias=bias, k=k, dil=dil:
                       knn_mr_fused(a, b, bias, k, dil), x, y)
        t_sm = bench(lambda a, b, bias=bias, k=k, dil=dil:
                     edge_partitioned_knn_mr(
                         mesh, a, b, bias, k=k, dilation=dil,
                         use_pallas=True), x, y)
        print(f"  {case}: bare {t_bare*1e3:6.2f} ms | shard_map(graph=1) "
              f"{t_sm*1e3:6.2f} ms | overhead "
              f"{(t_sm/t_bare-1)*100:+.1f}%", flush=True)


def main():
    which = sys.argv[1:] or ["tiles", "gather", "ties", "shardmap"]
    print(f"device: {jax.devices()[0]}", flush=True)
    if "tiles" in which:
        run_tiles()
    if "gather" in which:
        run_gather()
    if "ties" in which:
        run_ties()
    if "shardmap" in which:
        run_shardmap()


if __name__ == "__main__":
    main()
