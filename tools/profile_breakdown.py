#!/usr/bin/env python
"""Per-kernel time breakdown of the GKGNet forward at production shapes.

Times every distinct graph-kernel invocation of the eval forward (all 12
Grapher blocks + 4 label taps at the configured batch) standalone on the
device, for both the fused Pallas path and the XLA path, then runs the full
model both ways. The gap between the kernel sum and the full-model time is
the dense (stem/conv/FFN/BN) remainder — the roofline table VERDICT asks
for. Writes a markdown table to stdout.

Env: BD_BATCH (default 8), BD_SIZE (576), BD_ARCH (s), BD_ITERS (10),
BD_MODE (eval|train|both — train adds a fwd+bwd per-kernel table with the
recompute-gather VJP, plus the full jitted train step).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=10):
    """Time ``fn(*args)`` (must return a scalar) with the iteration loop ON
    DEVICE (lax.scan) and TWO-POINT overhead subtraction: the per-call
    dispatch/readback overhead through remote TPU tunnels is a fixed
    25-90 ms, so a single N-iteration measurement still carries
    overhead/N per iteration (3-9 ms at N=10 — round-3 finding); timing
    scans of N and 3N iterations and differencing cancels it exactly.
    The scanned epsilon is a runtime argument added to the first input so
    the body is not loop-invariant (XLA would hoist it otherwise)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(eps, *args):
        def body(c, e):
            return c + fn(*args[:-1], args[-1] + e).astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return total

    def timed(n):
        eps = jnp.zeros((n,), args[-1].dtype)
        np.asarray(run(eps, *args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(eps, *args))
        return time.perf_counter() - t0

    t1 = timed(iters)
    t3 = timed(3 * iters)
    return (t3 - t1) / (2 * iters)


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


def train_tables(arch: str, size: int, batch: int, iters: int):
    """fwd+bwd per-kernel table (the custom-VJP recompute-gather path) and
    the full jitted train step (fwd + dual loss + bwd + AdamW + BN stats) —
    the VERDICT r3 train-attribution ask."""
    import jax
    import jax.numpy as jnp
    import optax

    from gkgnet_tpu.core.optim import build_optimizer
    from gkgnet_tpu.core.schedules import step_lr_with_warmup
    from gkgnet_tpu.core.trainer import create_train_state, make_train_step
    from gkgnet_tpu.nn.classifier import GKGNetClassifier
    from gkgnet_tpu.ops.pallas.knn_mr import fused_fits, knn_mr_fused

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    print("\n-- train (fwd+bwd) per-kernel --", flush=True)
    rows = []
    total = 0.0
    for (name, cnt, bg, n, d, m, k, dil, has_bias) in kernel_cases(
            arch, size, batch):
        x = jnp.asarray(rng.standard_normal((bg, n, d)), dt)
        y = jnp.asarray(rng.standard_normal((bg, m, d)), dt)
        bias = (jnp.asarray(rng.standard_normal((n, m)) * 0.1, jnp.float32)
                if has_bias else None)
        if not fused_fits(n, m, k, dil, d=d, itembytes=jnp.dtype(dt).itemsize):
            continue

        def fwd_bwd(a, b, bias=bias, k=k, dil=dil):
            def loss(a2, b2):
                _, mr = knn_mr_fused(a2, b2, bias, k, dil)
                return jnp.sum(mr.astype(jnp.float32) ** 2)

            ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
            return (jnp.sum(ga).astype(jnp.float32)
                    + jnp.sum(gb).astype(jnp.float32)).astype(jnp.int32)

        t_fb = bench(jax.jit(fwd_bwd), x, y, iters=iters)
        rows.append((name, cnt, t_fb * 1e3))
        total += cnt * t_fb
        print(f"  {name}: fwd+bwd {t_fb * 1e3:7.2f} ms  x{cnt}", flush=True)

    model = GKGNetClassifier(arch=arch, n_classes=80, size=size,
                             drop_path=0.1, dtype=dt)
    # representative inputs — an all-zero image is the all-ties degenerate
    # worst case of the selection kernels (r3's "135 ms vs 78 ms" full-
    # model anomaly was THIS, not allocation pressure)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3)), dt)
    gt = jnp.asarray(rng.random((batch, 80)) < 0.05, jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               optax.sgd(1e-3), ema=True)
    sched = step_lr_with_warmup(1e-4, 1000, [10, 50], warmup_iters=5000)
    tx = build_optimizer(state.params, sched)
    state = state.replace(opt_state=tx.init(state.params))
    train_step = make_train_step(model, tx, lr_schedule=sched,
                                 ema_momentum=2e-4, donate=False)
    batch_dict = {"img": x, "gt_label": gt}
    key = jax.random.PRNGKey(1)
    import time as _time

    @jax.jit
    def run_steps(state):
        def body(st, _):
            st, logs = train_step(st, batch_dict, key)
            return st, logs["loss"]

        return jax.lax.scan(body, state, None, length=iters)[1][-1]

    np.asarray(run_steps(state))
    t0 = _time.perf_counter()
    np.asarray(run_steps(state))
    t_step = (_time.perf_counter() - t0) / iters

    # ---- phase split of the non-kernel remainder (VERDICT r3 ask) ------
    # eval fwd / train fwd (BN batch stats) / fwd+bwd / optimizer+EMA:
    # consecutive differences attribute BN-stat passes, the backward, and
    # the update machinery separately.
    head = model.build_loss_head()
    var_eval = {"params": state.params, "batch_stats": state.batch_stats,
                "constants": state.constants}
    rngs = {"droppath": key, "dilation": key, "perturbed": key}

    def fwd_eval(v, xx):
        return jnp.sum(model.apply(v, xx, train=False)[0].astype(jnp.float32))

    def fwd_train(v, xx):
        (score, _), _ = model.apply(v, xx, train=True, rngs=rngs,
                                    mutable=["batch_stats"])
        return jnp.sum(score.astype(jnp.float32))

    def fwd_bwd(v, xx):
        from gkgnet_tpu.nn.classifier import parse_losses

        def loss(params):
            (score, _), _ = model.apply(
                {**v, "params": params}, xx, train=True, rngs=rngs,
                mutable=["batch_stats"])
            total, _ = parse_losses(head.loss(score, gt))
            return total

        g = jax.grad(loss)(v["params"])
        return sum(jnp.sum(t).astype(jnp.float32)
                   for t in jax.tree.leaves(g))

    grads0 = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-4, state.params)

    def opt_only(o, s, eps):
        g = jax.tree.map(lambda t: t + eps.astype(t.dtype), grads0)
        updates, new_o = tx.update(g, o, s)
        newp = optax.apply_updates(s, updates)
        m = 2e-4
        ema = jax.tree.map(lambda e, p: (1 - m) * e + m * p, s, newp)
        return (sum(jnp.sum(t).astype(jnp.float32)
                    for t in jax.tree.leaves(newp))
                + sum(jnp.sum(t).astype(jnp.float32)
                      for t in jax.tree.leaves(ema)))

    t_fe = bench(fwd_eval, var_eval, x, iters=iters)
    t_ft = bench(fwd_train, var_eval, x, iters=iters)
    t_fb = bench(fwd_bwd, var_eval, x, iters=iters)

    @jax.jit
    def opt_run(eps_arr, o, s):
        def body(c, e):
            return c + opt_only(o, s, e), None
        return jax.lax.scan(body, jnp.float32(0), eps_arr)[0]

    def opt_timed(n):
        eps = jnp.zeros((n,), jnp.float32)
        np.asarray(opt_run(eps, state.opt_state, state.params))
        t0 = _time.perf_counter()
        np.asarray(opt_run(eps, state.opt_state, state.params))
        return _time.perf_counter() - t0

    t_opt = (opt_timed(3 * iters) - opt_timed(iters)) / (2 * iters)

    print("\n| kernel | xN | fwd+bwd ms |")
    print("|---|---|---|")
    for name, cnt, ms in rows:
        print(f"| {name} | {cnt} | {ms:.2f} |")
    print(f"| kernel SUM | | {total * 1e3:.2f} |")
    print(f"| FULL TRAIN STEP | | {t_step * 1e3:.2f} |")
    print(f"\ntrain dense+loss+opt remainder: "
          f"{(t_step - total) * 1e3:.2f} ms")
    print("\n-- train phase split --")
    print(f"| phase | ms | delta |")
    print(f"|---|---|---|")
    print(f"| fwd eval-mode | {t_fe*1e3:.2f} | |")
    print(f"| fwd train-mode (BN stats, droppath) | {t_ft*1e3:.2f} "
          f"| +{(t_ft-t_fe)*1e3:.2f} |")
    print(f"| fwd+bwd (dual loss, grad) | {t_fb*1e3:.2f} "
          f"| +{(t_fb-t_ft)*1e3:.2f} |")
    print(f"| optimizer+EMA standalone | {t_opt*1e3:.2f} | |")
    print(f"| full step (clip+sched+logvars) | {t_step*1e3:.2f} "
          f"| +{(t_step-t_fb-t_opt)*1e3:.2f} |")


def main():
    batch = int(os.environ.get("BD_BATCH", "8"))
    size = int(os.environ.get("BD_SIZE", "576"))
    arch = os.environ.get("BD_ARCH", "s")
    iters = int(os.environ.get("BD_ITERS", "10"))
    mode = os.environ.get("BD_MODE", "eval")
    if mode == "train":
        import jax

        print(f"device: {jax.devices()[0]}  batch={batch} size={size} "
              f"arch={arch}", flush=True)
        train_tables(arch, size, batch, iters)
        return

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

    # full model FIRST: measuring it after the per-kernel sweep holds
    # ~2 GB of test arrays live and reads ~75% slower (measured 135 vs
    # 78 ms — HBM pressure changes XLA's allocation/layout decisions)
    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    model = GKGNetClassifier(arch=arch, n_classes=80, size=size, dtype=dt)
    xin = jnp.zeros((batch, size, size, 3), dt)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), xin))()

    def model_scalar(v, x):
        return jnp.sum(model.apply(v, x, train=False)[0].astype(jnp.float32))

    set_knn_impl("auto")
    t_model = bench(model_scalar, variables, xin, iters=iters)
    set_knn_impl("xla")
    t_model_xla = bench(model_scalar, variables, xin, iters=iters)
    set_knn_impl("auto")
    print(f"full model: fused {t_model*1e3:.2f} ms  xla "
          f"{t_model_xla*1e3:.2f} ms", flush=True)

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
    if mode == "both":
        train_tables(arch, size, batch, iters)


if __name__ == "__main__":
    main()
