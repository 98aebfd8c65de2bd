"""Fused-kernel selector comparison: parity vs the XLA path + on-device
timing at the production stage shapes, for each selection algorithm in
ops/pallas/knn_mr (masked argmin vs foldc lane-cache).

Usage: python tools/exp_selectors.py [case ...]   (default: all cases)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gkgnet_tpu.ops.pallas import knn_mr
from gkgnet_tpu.ops.knn import knn_graph, set_knn_impl
from gkgnet_tpu.ops.aggregate import gather_nodes

SELECTORS = ("argmin", "foldc")


def bench(fn, *args, iters=20):
    # on-device scan loop with a runtime epsilon: one dispatch per
    # measurement, nothing loop-invariant to hoist (docs/PERF.md)
    @jax.jit
    def run(eps, *a):
        def body(c, e):
            i, mr = fn(a[0] + e, *a[1:])
            return (c + jnp.sum(i).astype(jnp.float32)
                    + jnp.sum(mr).astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0), eps)[0]

    eps = jnp.zeros((iters,), args[0].dtype)
    np.asarray(run(eps, *args))
    t0 = time.perf_counter()
    np.asarray(run(eps, *args))
    return (time.perf_counter() - t0) / iters


# name: (BG, N, D, M, k, dilation, has_bias)
CASES = {
    "stage1":   (16, 20736, 40, 1296, 9, 1, True),
    "stage2":   (16, 5184, 80, 1296, 9, 1, True),
    "stage3d2": (16, 1296, 200, 1296, 9, 2, True),
    "stage3d3": (16, 1296, 200, 1296, 9, 3, True),
    "stage4d3": (16, 324, 320, 324, 9, 3, True),
    "label1":   (16, 80, 40, 20736, 9, 1, False),
    "ties":     (2, 256, 8, 300, 6, 1, False),
}

rng = np.random.default_rng(0)
names = sys.argv[1:] or list(CASES)
for name in names:
    bg, n, d, m, k, dil, hb = CASES[name]
    if name == "ties":  # quantized features force exact distance ties
        x = jnp.asarray(rng.integers(0, 2, (bg, n, d)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 2, (bg, m, d)).astype(np.float32))
    else:
        x = jnp.asarray(rng.standard_normal((bg, n, d)), jnp.bfloat16)
        y = jnp.asarray(rng.standard_normal((bg, m, d)), jnp.bfloat16)
    bias = (jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32)
            if hb else None)
    out, t = {}, {}
    for sel in SELECTORS:
        knn_mr.set_mr_selector(sel)
        f = jax.jit(lambda a, b, bb=bias, k=k, dil=dil:
                    knn_mr.knn_mr_fused(a, b, bb, k, dil))
        idx, mr = jax.device_get(f(x, y))
        out[sel] = (np.asarray(idx), np.asarray(mr, dtype=np.float32))
        t[sel] = bench(lambda a, b, bb=bias, k=k, dil=dil:
                       knn_mr.knn_mr_fused(a, b, bb, k, dil), x, y)
    # XLA reference (top_k + gather max-relative): the parity oracle
    set_knn_impl("xla")

    def xla_ref(a, b):
        idx = knn_graph(a, b, k=k * dil, bias=bias)[..., ::dil]
        xj = gather_nodes(b, idx)
        return idx, jnp.max(xj - a[:, :, None, :].astype(xj.dtype), axis=2)

    xi, xmr = jax.device_get(jax.jit(xla_ref)(x, y))
    set_knn_impl("auto")
    out["xla"] = (np.asarray(xi), np.asarray(xmr, dtype=np.float32))
    msg = f"{name}:"
    for sel in SELECTORS:
        ok = np.array_equal(out[sel][0], out["xla"][0])
        err = float(np.abs(out[sel][1] - out["xla"][1]).max())
        msg += f" {sel}[vs_xla idx={ok} mr_err={err:.1e} {t[sel]*1e3:6.2f}ms]"
    print(msg + f" speedup x{t['argmin'] / t['foldc']:.2f}", flush=True)
knn_mr.set_mr_selector("auto")
