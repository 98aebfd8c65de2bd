#!/usr/bin/env python
"""Round-5 dense-path attack: per-op breakdown of the NON-graph-kernel
~64% of the step (VERDICT r4 weak #1/#2).

Phases (env EXP5, comma list, default all):
  profile  — jax.profiler device trace of eval fwd + full train step,
             parsed programmatically via jax.profiler.ProfileData into a
             per-op table (no tensorboard needed).
  micro    — standalone timings of every dense component at real
             GKGNet-S @576² geometry (stem, fc1/fc2, aggregate BasicConv,
             FFN, downsample, BN epilogue) fwd and fwd+bwd.
  variants — MXU-lowering candidates for the grouped 1x1 convs
             (g=4 batched einsum vs block-diag dense vs unrolled) and
             thin-K/N matmuls at stage shapes.

Run on TPU in ONE process (backend init ~400s):
  timeout 3500 python tools/exp_round5_dense.py
"""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

PHASES = os.environ.get("EXP5", "profile,micro,variants").split(",")
BATCH = int(os.environ.get("B", "8"))
ARCH = os.environ.get("ARCH", "s")      # smoke-testing on CPU: ARCH=t SIZE=128
SIZE = int(os.environ.get("SIZE", "576"))


def bench(fn, *args, iters=10):
    """On-device scan loop + two-point overhead subtraction (see
    tools/profile_breakdown.py). fn(*args) must return a scalar; the
    scanned epsilon is added to the LAST arg."""

    @jax.jit
    def run(eps, *args):
        def body(c, e):
            return c + fn(*args[:-1], args[-1] + e).astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return total

    def timed(n):
        eps = jnp.zeros((n,), args[-1].dtype)
        np.asarray(run(eps, *args))
        t0 = time.perf_counter()
        np.asarray(run(eps, *args))
        return time.perf_counter() - t0

    t1 = timed(iters)
    t3 = timed(3 * iters)
    return (t3 - t1) / (2 * iters)


# ---------------------------------------------------------------- profile

def _aggregate_trace(logdir, n_iters):
    """Parse the xplane trace: per-op totals on the TPU device plane(s)."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("  !! no xplane.pb found under", logdir)
        return
    pd = ProfileData.from_file(paths[-1])
    per_op = defaultdict(float)        # instr name -> total ns (sync line)
    per_cat = defaultdict(float)       # op kind -> total ns
    op_text = {}
    total_ns = async_ns = module_ns = 0.0
    for plane in pd.planes:
        if "/device:" not in plane.name or "CUSTOM" in plane.name:
            continue
        for line in plane.lines:
            lname = getattr(line, "name", "")
            if lname == "XLA Modules":
                module_ns += sum(e.duration_ns for e in line.events)
                continue
            if lname == "Async XLA Ops":
                async_ns += sum(e.duration_ns for e in line.events)
                continue
            if lname != "XLA Ops":
                continue
            for ev in line.events:
                text = ev.name
                instr = text.split(" = ")[0].lstrip("%")
                kind = instr.split(".")[0]
                dur = ev.duration_ns
                per_op[instr] += dur
                per_cat[kind] += dur
                total_ns += dur
                if instr not in op_text:
                    op_text[instr] = text
    print(f"  module total: {module_ns / 1e6 / n_iters:.2f} ms/iter | "
          f"sync XLA ops: {total_ns / 1e6 / n_iters:.2f} ms/iter | "
          f"async (overlapped DMA): {async_ns / 1e6 / n_iters:.2f} ms/iter")
    print("  -- by op kind (sync line) --")
    for cat, ns in sorted(per_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"    {cat:32s} {ns / 1e6 / n_iters:8.3f} ms "
              f"({100 * ns / total_ns:5.1f}%)")
    print("  -- top 50 ops --")
    for name, ns in sorted(per_op.items(), key=lambda kv: -kv[1])[:50]:
        print(f"    {ns / 1e6 / n_iters:8.3f} ms  {op_text[name][:130]}")


def phase_profile():
    from gkgnet_tpu.nn.classifier import GKGNetClassifier

    model = GKGNetClassifier(arch=ARCH, n_classes=80, size=SIZE,
                             k=3 if ARCH == "t" and SIZE <= 128 else 9,
                             k_label_gcn=3 if ARCH == "t" and SIZE <= 128 else 9,
                             dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)), jnp.bfloat16)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False)[0])
    fwd(variables, x).block_until_ready()
    n = 10
    logdir = "/tmp/trace_eval"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(n):
            out = fwd(variables, x)
        out.block_until_ready()
    print("\n== eval forward per-op breakdown ==")
    _aggregate_trace(logdir, n)

    # ---- full train step
    import optax
    from gkgnet_tpu.core.optim import build_optimizer
    from gkgnet_tpu.core.schedules import step_lr_with_warmup
    from gkgnet_tpu.core.trainer import create_train_state, make_train_step

    model_t = GKGNetClassifier(arch=ARCH, k=3 if ARCH == "t" and SIZE <= 128 else 9,
                               k_label_gcn=3 if ARCH == "t" and SIZE <= 128 else 9, n_classes=80,
                               size=SIZE, drop_path=0.1, dtype=jnp.bfloat16)
    state = create_train_state(model_t, jax.random.PRNGKey(0),
                               jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.bfloat16),
                               optax.sgd(1e-3), ema=True)
    sched = step_lr_with_warmup(1e-4, 10, [10, 50], warmup_iters=5)
    tx = build_optimizer(state.params, sched)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model_t, tx, lr_schedule=sched,
                           ema_momentum=2e-4, donate=False)
    batch = {"img": x.astype(jnp.float32),
             "gt_label": jnp.asarray(
                 rng.random((BATCH, 80)) < 0.05, jnp.float32)}
    state2, logs = step(state, batch, jax.random.PRNGKey(7))
    jax.block_until_ready(logs)
    logdir = "/tmp/trace_train"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(n):
            state2, logs = step(state2, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(logs)
    print("\n== train step per-op breakdown ==")
    _aggregate_trace(logdir, n)


# ---------------------------------------------------------------- micro

def phase_micro():
    from gkgnet_tpu.nn.layers import (BasicConv, ConvNorm, Downsample, FFN,
                                      Stem)

    print("\n== standalone dense components (GKGNet-S @576², "
          f"batch {BATCH}, bf16) ==")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # (name, module, input shape, per-step invocation count)
    stages = [(144, 80, 2), (72, 160, 2), (36, 400, 6), (18, 640, 2)]
    cases = [("stem", Stem(80, act="gelu", dtype=dt),
              (BATCH, 576, 576, 3), 1)]
    for hw, c, blocks in stages:
        cases += [
            (f"s{hw} fc (C={c})", ConvNorm(c, dtype=dt),
             (BATCH, hw, hw, c), 2 * blocks),  # fc1+fc2 per Grapher
            (f"s{hw} aggconv 2C->C g4", BasicConv([2 * c, c], "gelu", "batch",
                                                  dtype=dt),
             (BATCH, hw * hw, 2 * c), blocks),
            (f"s{hw} ffn C->4C->C", FFN(4 * c, c, act="gelu", dtype=dt),
             (BATCH, hw, hw, c), blocks),
        ]
    cases += [
        ("down 144->72", Downsample(160, dtype=dt), (BATCH, 144, 144, 80), 1),
        ("down 72->36", Downsample(400, dtype=dt), (BATCH, 72, 72, 160), 1),
        ("down 36->18", Downsample(640, dtype=dt), (BATCH, 36, 36, 400), 1),
    ]

    total_fwd = total_bwd = 0.0
    print(f"  {'component':28s} {'fwd ms':>8s} {'fwd+bwd ms':>10s} {'xN':>3s}")
    for name, mod, shape, count in cases:
        xx = jnp.asarray(rng.standard_normal(shape), dt)
        variables = mod.init(jax.random.PRNGKey(0), xx, False)

        def f(v, a, mod=mod):
            return jnp.sum(mod.apply(v, a, False).astype(jnp.float32))

        t_f = bench(f, variables, xx) * 1e3

        def fb(v, a, mod=mod):
            l, g = jax.value_and_grad(
                lambda vv, aa: jnp.sum(
                    mod.apply(vv, aa, True,
                              mutable=["batch_stats"])[0].astype(jnp.float32)),
                argnums=(0, 1))(v, a)
            return l + sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(g))

        t_fb = bench(fb, variables, xx) * 1e3
        total_fwd += t_f * count
        total_bwd += t_fb * count
        print(f"  {name:28s} {t_f:8.3f} {t_fb:10.3f} x{count}")
    print(f"  SUM over per-step invocations: fwd {total_fwd:.2f} ms, "
          f"fwd+bwd {total_bwd:.2f} ms")


# ---------------------------------------------------------------- variants

def phase_variants():
    print("\n== grouped 1x1 conv lowering variants (bf16, batch folded) ==")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # (rows, cin, cout, groups) — aggconv geometry per stage + fc geometry
    geoms = [
        ("s1 agg", BATCH * 20736, 160, 80, 4),
        ("s2 agg", BATCH * 5184, 320, 160, 4),
        ("s3 agg", BATCH * 1296, 800, 400, 4),
        ("s4 agg", BATCH * 324, 1280, 640, 4),
        ("s1 fc", BATCH * 20736, 80, 80, 1),
        ("s2 fc", BATCH * 5184, 160, 160, 1),
        ("s3 fc", BATCH * 1296, 400, 400, 1),
        ("s4 fc", BATCH * 324, 640, 640, 1),
        ("s1 ffn1", BATCH * 20736, 80, 320, 1),
        ("s1 ffn2", BATCH * 20736, 320, 80, 1),
    ]
    print(f"  {'geom':10s} {'rows':>8s} {'ci':>5s} {'co':>5s} "
          f"{'einsum-g':>9s} {'blockdiag':>10s} {'unroll':>8s} {'pad128':>8s}")
    for name, rows, ci, co, g in geoms:
        x = jnp.asarray(rng.standard_normal((rows, ci)), dt)
        wg = jnp.asarray(rng.standard_normal((g, ci // g, co // g)), dt)

        def grouped(w, a):
            xg = a.reshape(rows, g, ci // g)
            y = jnp.einsum("ngi,gio->ngo", xg, w)
            return jnp.sum(y.astype(jnp.float32))

        t_g = bench(grouped, wg, x) * 1e3

        # block-diagonal dense: same math, zeros off-block, one fat matmul
        def blockdiag(w, a):
            wd = jax.scipy.linalg.block_diag(*[w[i] for i in range(g)])
            y = a @ wd
            return jnp.sum(y.astype(jnp.float32))

        t_b = bench(blockdiag, wg, x) * 1e3

        def unroll(w, a):
            xg = a.reshape(rows, g, ci // g)
            ys = [xg[:, i] @ w[i] for i in range(g)]
            return jnp.sum(jnp.concatenate(ys, -1).astype(jnp.float32))

        t_u = bench(unroll, wg, x) * 1e3

        # zero-pad K and N to 128 lanes (dense only meaningful for g=1)
        def pad128(w, a):
            wd = jax.scipy.linalg.block_diag(*[w[i] for i in range(g)])
            kp = (-ci) % 128
            np_ = (-co) % 128
            wd = jnp.pad(wd, ((0, kp), (0, np_)))
            ap = jnp.pad(a, ((0, 0), (0, kp)))
            y = (ap @ wd)[:, :co]
            return jnp.sum(y.astype(jnp.float32))

        t_p = bench(pad128, wg, x) * 1e3
        print(f"  {name:10s} {rows:8d} {ci:5d} {co:5d} {t_g:9.3f} "
              f"{t_b:10.3f} {t_u:8.3f} {t_p:8.3f}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    t0 = time.time()
    if "profile" in PHASES:
        phase_profile()
    if "micro" in PHASES:
        phase_micro()
    if "variants" in PHASES:
        phase_variants()
    print(f"\nall done in {time.time() - t0:.0f}s")
