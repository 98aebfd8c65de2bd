#!/usr/bin/env python
"""Per-kernel time breakdown of the GKGNet forward at production shapes.

Times every distinct graph-kernel invocation of the eval forward (all 12
Grapher blocks + 4 label taps at the configured batch) standalone on the
device, for both the fused Pallas path and the XLA path, then runs the full
model both ways. The gap between the kernel sum and the full-model time is
the dense (stem/conv/FFN/BN) remainder — the roofline table VERDICT asks
for. Writes a markdown table to stdout.

Env: BD_BATCH (default 8), BD_SIZE (576), BD_ARCH (s), BD_ITERS (10).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=10):
    """Time ``fn(*args)`` (must return a scalar) with the iteration loop ON
    DEVICE (lax.scan): a single dispatch per measurement, so per-call
    dispatch/readback overhead (tens of ms through remote TPU tunnels —
    measured 71 ms fixed per dispatch) never pollutes the numbers. The
    scanned epsilon is added to the first argument so the body is not
    loop-invariant (XLA would hoist it out of the loop otherwise)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(eps, *args):
        def body(c, e):
            return c + fn(*args[:-1], args[-1] + e).astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return total

    # eps must be a RUNTIME argument: as a traced constant XLA folds x+0
    # and hoists the whole body out of the loop
    eps = jnp.zeros((iters,), args[-1].dtype)
    np.asarray(run(eps, *args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(eps, *args))
    return (time.perf_counter() - t0) / iters


def kernel_cases(arch: str, size: int, batch: int, k: int = 9,
                 num_group: int = 2):
    """(name, count, BG, N, D, M, k, dilation, has_bias) for each distinct
    graph-kernel shape of the forward."""
    from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS, REDUCE_RATIOS

    opt = ARCH_SETTINGS[arch]
    blocks, channels = opt["blocks"], opt["channels"]
    bg = batch * num_group
    n = (size // 4) ** 2
    max_dil = 49 // k
    cases = []
    gi = 0
    for i, nb in enumerate(blocks):
        if i > 0:
            n //= 4
        c = channels[i]
        r = REDUCE_RATIOS[i]
        m = n // (r * r)
        dil_counts = {}
        for _ in range(nb):
            dil = min(gi // 4 + 1, max_dil)
            dil_counts[dil] = dil_counts.get(dil, 0) + 1
            gi += 1
        for dil, cnt in sorted(dil_counts.items()):
            cases.append((f"stage{i + 1}/d{dil}", cnt, bg, n, c // num_group,
                          m, k, dil, True))
        cases.append((f"label{i + 1}", 1, bg, 80, c // num_group, n, k, 1,
                      False))
    return cases


def main():
    batch = int(os.environ.get("BD_BATCH", "8"))
    size = int(os.environ.get("BD_SIZE", "576"))
    arch = os.environ.get("BD_ARCH", "s")
    iters = int(os.environ.get("BD_ITERS", "10"))

    import jax
    import jax.numpy as jnp

    from gkgnet_tpu.ops.aggregate import max_relative
    from gkgnet_tpu.ops.knn import dilate_edges, knn_graph, set_knn_impl
    from gkgnet_tpu.ops.pallas.knn_mr import fused_fits, knn_mr_fused
    from gkgnet_tpu.utils.profiling import model_flops

    print(f"device: {jax.devices()[0]}  batch={batch} size={size} "
          f"arch={arch}", flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    total_fused = total_xla = 0.0
    rows = []
    for (name, cnt, bg, n, d, m, k, dil, has_bias) in kernel_cases(
            arch, size, batch):
        x = jnp.asarray(rng.standard_normal((bg, n, d)), dt)
        y = jnp.asarray(rng.standard_normal((bg, m, d)), dt)
        bias = (jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32)
                if has_bias else None)

        # reduce outputs to scalars so the host readback (slow through
        # remote tunnels) doesn't pollute the timing
        def xla_path(x, y, bias=bias, k=k, dil=dil):
            set_knn_impl("xla")
            i = dilate_edges(knn_graph(x, y, k=k * dil, bias=bias),
                             dilation=dil)
            set_knn_impl("auto")
            return jnp.sum(i) + jnp.sum(max_relative(x, i, y)).astype(
                jnp.int32)

        t_x = bench(jax.jit(xla_path), x, y, iters=iters)
        fits = fused_fits(n, m, k, dil, d=d,
                          itembytes=jnp.dtype(dt).itemsize)
        if fits:
            def fused_path(a, b, bias=bias, k=k, dil=dil):
                i, mr = knn_mr_fused(a, b, bias, k, dil)
                return jnp.sum(i) + jnp.sum(mr).astype(jnp.int32)

            t_f = bench(jax.jit(fused_path), x, y, iters=iters)
        else:
            t_f = t_x
        rows.append((name, cnt, bg, n, m, d, k * dil,
                     t_f * 1e3, t_x * 1e3, fits))
        total_fused += cnt * t_f
        total_xla += cnt * t_x
        print(f"  {name}: fused {t_f * 1e3:7.2f} ms  xla {t_x * 1e3:7.2f} ms"
              f"  x{cnt}  (fits={fits})", flush=True)

    # full model, both paths
    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    model = GKGNetClassifier(arch=arch, n_classes=80, size=size, dtype=dt)
    xin = jnp.zeros((batch, size, size, 3), dt)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), xin))()

    def model_scalar(v, x):
        return jnp.sum(model.apply(v, x, train=False)[0])

    set_knn_impl("auto")
    t_model = bench(model_scalar, variables, xin, iters=iters)
    set_knn_impl("xla")
    t_model_xla = bench(model_scalar, variables, xin, iters=iters)
    set_knn_impl("auto")

    fl = model_flops(arch, size, batch)
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    print()
    print("| kernel | xN | BG | N | M | D | k*d | fused ms | xla ms |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (name, cnt, bg, n, m, d, kd, tf, tx, fits) in rows:
        tag = "" if fits else " (fallback)"
        print(f"| {name} | {cnt} | {bg} | {n} | {m} | {d} | {kd} "
              f"| {tf:.2f}{tag} | {tx:.2f} |")
    print(f"| kernel SUM | | | | | | | {total_fused * 1e3:.2f} "
          f"| {total_xla * 1e3:.2f} |")
    print(f"| FULL MODEL | | | | | | | {t_model * 1e3:.2f} "
          f"| {t_model_xla * 1e3:.2f} |")
    dense = t_model - total_fused
    print(f"\ndense remainder (model - kernels): {dense * 1e3:.2f} ms")
    print(f"model flops: {fl['per_image_total'] / 1e9:.1f} G/img; "
          f"MFU at full-model time: "
          f"{fl['total'] / t_model / peak * 100:.1f}% "
          f"(peak {peak / 1e12:.0f} TF)")


if __name__ == "__main__":
    main()
