"""Phase-isolation microbenchmark of the fused kNN+MR kernel at stage-1
geometry, plus an fp64 ordering oracle for the XLA-vs-Pallas flip question.

Phases (each its own pallas kernel, stage1 shape BG=16, N=20736, M=1296,
D=40, k=9):
  dist      distance matmul + row norms + write (T, M) scratch
  sel       dist + masked-argmin selection rounds (idx out, NO gathers)
  selg      dist + selection + one-hot gather matmuls (the full argmin
            kernel = production path)
  gfix      dist + gathers with FIXED columns (no selection rounds)

The gap between lines tells which phase dominates — measured, not modeled.

Oracle: fetch the device-produced bf16 normalized features, compute exact
fp64 distances on host, and for every implementation (pallas idx, XLA idx)
report the distribution of TRUE-ORDER violations: count and the largest
fp64 gap any violation crosses. An implementation that only violates at
gaps <= ~1e-6 is rounding-faithful; violations at 1e-4-scale gaps indicate
a real precision loss.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BG, N, D, M, K = 16, 20736, 40, 1296, 9
TILE = 256


def _dist(x_ref, y_ref):
    x_raw = x_ref[0].astype(jnp.float32)
    y_raw = y_ref[0].astype(jnp.float32)
    xn = x_raw / jnp.maximum(jnp.sqrt(jnp.sum(x_raw * x_raw, 1,
                                              keepdims=True)), 1e-12)
    yn = y_raw / jnp.maximum(jnp.sqrt(jnp.sum(y_raw * y_raw, 1,
                                              keepdims=True)), 1e-12)
    xb = xn.astype(jnp.bfloat16)
    yb = yn.astype(jnp.bfloat16)
    inner = jax.lax.dot_general(
        xb, yb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    x32 = xb.astype(jnp.float32)
    y32 = yb.astype(jnp.float32)
    x_sq = jnp.sum(x32 * x32, 1, keepdims=True)
    y_sq = jnp.sum(y32 * y32, 1, keepdims=True)
    return x_sq - 2.0 * inner + y_sq.T, x_raw, y_ref[0]


def k_dist(x_ref, y_ref, o_ref, dist_ref):
    d, _, _ = _dist(x_ref, y_ref)
    dist_ref[...] = d
    o_ref[0] = jnp.sum(dist_ref[...], axis=1, keepdims=True)


def k_sel(x_ref, y_ref, o_ref, dist_ref, *, gather: bool, select: bool):
    t = TILE
    dist, x_raw, y_in = _dist(x_ref, y_ref)
    dist_ref[...] = dist
    col = jax.lax.broadcasted_iota(jnp.int32, (t, M), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, K), 1)
    big = jnp.float32(jnp.inf)
    bigc = jnp.int32(1 << 30)
    y_gd = y_in.astype(jnp.bfloat16)
    acc0 = jnp.full((t, D), -jnp.inf, jnp.float32)
    idx0 = jnp.zeros((t, K), jnp.int32)

    def body(j, carry):
        acc, idx = carry
        dd = dist_ref[...]
        if select:
            gv = jnp.min(dd, axis=1)
            eq = dd == gv[:, None]
            idx_j = jnp.min(jnp.where(eq, col, bigc), axis=1).astype(jnp.int32)
            mask = col == idx_j[:, None]
        else:
            idx_j = jnp.full((t,), 7, jnp.int32) + j
            mask = col == idx_j[:, None]
        idx = jnp.where(lane_k == j, idx_j[:, None], idx)
        if gather:
            g = jax.lax.dot_general(
                mask.astype(jnp.bfloat16), y_gd,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc = jnp.maximum(acc, g - x_raw)
        if select:
            @pl.when(j != K - 1)
            def _():
                dist_ref[...] = jnp.where(mask, big, dd)
        return acc, idx

    acc, idx = jax.lax.fori_loop(0, K, body, (acc0, idx0))
    o_ref[0] = (jnp.sum(acc, axis=1, keepdims=True)
                + jnp.sum(idx, axis=1, keepdims=True).astype(jnp.float32))


def make(kern, **kw):
    if kw:
        kern = functools.partial(kern, **kw)
    return pl.pallas_call(
        kern,
        grid=(BG, N // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 1), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, N, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def bench(fn, *args, iters=20):
    @jax.jit
    def run(eps, *a):
        def body(c, e):
            return c + jnp.sum(fn(a[0] + e, *a[1:])), None

        return jax.lax.scan(body, jnp.float32(0), eps)[0]

    eps = jnp.zeros((iters,), args[0].dtype)
    np.asarray(run(eps, *args))
    t0 = time.perf_counter()
    np.asarray(run(eps, *args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BG, N, D)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((BG, M, D)), jnp.bfloat16)

    variants = [
        ("dist ", make(k_dist)),
        ("sel  ", make(k_sel, gather=False, select=True)),
        ("gfix ", make(k_sel, gather=True, select=False)),
        ("selg ", make(k_sel, gather=True, select=True)),
    ]
    for name, fn in variants:
        t = bench(fn, x, y)
        print(f"{name}: {t*1e3:7.2f} ms "
              f"({t/ (BG * N // TILE) * 1e6:.2f} us/tile)", flush=True)

    # ---------------- fp64 ordering oracle (smaller slice) ----------------
    from gkgnet_tpu.ops.knn import knn_graph, l2_normalize
    from gkgnet_tpu.ops.pallas import knn_mr

    xs, ys = x[:2, :2048], y[:2]
    xn = np.asarray(jax.device_get(l2_normalize(xs)), np.float64)
    yn = np.asarray(jax.device_get(l2_normalize(ys)), np.float64)
    d64 = (np.sum(xn * xn, -1)[:, :, None] - 2 * np.einsum(
        'bnd,bmd->bnm', xn, yn) + np.sum(yn * yn, -1)[:, None, :])
    true_idx = np.argsort(d64, axis=-1, kind="stable")[..., :K]

    knn_mr.set_mr_selector("argmin")
    p_idx = np.asarray(jax.device_get(jax.jit(
        lambda a, b: knn_mr.knn_mr_fused(a, b, None, K, 1)[0])(xs, ys)))
    from gkgnet_tpu.ops.knn import set_knn_impl
    set_knn_impl("xla")
    x_idx = np.asarray(jax.device_get(jax.jit(
        lambda a, b: knn_graph(a, b, k=K))(xs, ys)))
    set_knn_impl("auto")

    for name, idx in (("pallas", p_idx), ("xla", x_idx)):
        viol = 0
        max_gap = 0.0
        rows = 0
        for b in range(idx.shape[0]):
            for r in range(idx.shape[1]):
                if np.array_equal(idx[b, r], true_idx[b, r]):
                    continue
                rows += 1
                got = d64[b, r, idx[b, r]]
                want = d64[b, r, true_idx[b, r]]
                gap = float(np.max(np.abs(np.sort(got) - np.sort(want))))
                if gap > 0:
                    viol += 1
                    max_gap = max(max_gap, gap)
        tot = idx.shape[0] * idx.shape[1]
        print(f"oracle[{name}]: order-mismatch rows {rows}/{tot}, "
              f"set-violations {viol}, max fp64 gap crossed {max_gap:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
