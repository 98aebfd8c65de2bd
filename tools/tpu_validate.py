#!/usr/bin/env python
"""On-device validation + microbenchmark of the Pallas graph kernels against
the XLA path on production shapes. Run on a real TPU chip; prints parity
verdicts and per-op timings (host-readback timed, honest through remote
tunnels)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=5):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from gkgnet_tpu.ops.aggregate import max_relative
    from gkgnet_tpu.ops.knn import dilate_edges, knn_graph, l2_normalize
    from gkgnet_tpu.ops.pallas.knn_mr import knn_mr_fused
    from gkgnet_tpu.ops.pallas.knn_topk import knn_topk

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # (name, BG, N, D, M, k, dilation)  — the four stages + label path @576
    cases = [
        ("stage1", 2, 20736, 40, 1296, 9, 1),
        ("stage2", 2, 5184, 80, 1296, 9, 1),
        ("stage3", 2, 1296, 200, 1296, 9, 2),
        ("stage4", 2, 324, 320, 324, 9, 3),
        ("label4", 2, 80, 320, 324, 9, 1),
    ]
    # bf16 = the production model dtype; filter with VALIDATE_DTYPES=bfloat16
    # and VALIDATE_CASES=stage4,label4 (the full sweep outlives a 10-minute
    # budget through the remote tunnel)
    sel = os.environ.get("VALIDATE_DTYPES", "float32,bfloat16").split(",")
    dtypes = [dt for dt in (jnp.float32, jnp.bfloat16)
              if jnp.dtype(dt).name in sel]
    case_sel = os.environ.get("VALIDATE_CASES")
    if case_sel:
        wanted = case_sel.split(",")
        cases = [c for c in cases if c[0] in wanted]
    for (name, bg, n, d, m, k, dil), dt in [
            (c, dt) for dt in dtypes for c in cases]:
        name = f"{name}/{jnp.dtype(dt).name}"
        x = jnp.asarray(rng.standard_normal((bg, n, d)), dt)
        y = jnp.asarray(rng.standard_normal((bg, m, d)), dt)
        bias = jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32) \
            if name.startswith("stage") else None

        ridx = dilate_edges(knn_graph(x, y, k=k * dil, bias=bias),
                            dilation=dil)
        rmr = max_relative(x, ridx, y)
        idx, mr = knn_mr_fused(x, y, bias, k, dil)
        # On hardware the Pallas kernel and the XLA path compute the fp32
        # distances with different accumulation orders, so bitwise idx
        # equality can fail at genuine near-ties; report the row-match
        # rate (tools/exp_selectors.py does the fp64-oracle judgement)
        idx_np, ridx_np = np.asarray(idx), np.asarray(ridx)
        match_rate = float((idx_np == ridx_np).all(-1).mean())
        idx_exact = match_rate == 1.0
        idx_ok = f"{idx_exact} (rate={match_rate:.4f})"
        mr_err = float(np.abs(np.asarray(mr) - np.asarray(rmr)).max())

        xn, yn = l2_normalize(x), l2_normalize(y)
        tk_ok = np.array_equal(
            np.asarray(knn_topk(xn, yn, k=k * dil, bias=bias)),
            np.asarray(knn_graph(xn, yn, k=k * dil, bias=bias,
                                 normalize=False)))

        def xla_path(x, y, bias=bias, k=k, dil=dil):
            i = dilate_edges(knn_graph(x, y, k=k * dil, bias=bias),
                             dilation=dil)
            return i, max_relative(x, i, y)

        t_xla = bench(jax.jit(xla_path), x, y)
        t_pl = bench(jax.jit(
            lambda a, b: knn_mr_fused(a, b, bias, k, dil)), x, y)
        edges = bg * n * k
        print(f"{name}: idx_match={idx_ok} topk_match={tk_ok} "
              f"mr_err={mr_err:.2e} | xla {t_xla*1e3:.2f}ms "
              f"pallas {t_pl*1e3:.2f}ms speedup x{t_xla/t_pl:.2f} "
              f"({edges/t_pl/1e6:.0f}M edges/s)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
