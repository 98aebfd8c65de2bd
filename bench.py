"""Single-chip benchmark: GKGNet-S eval forward throughput at 576^2 (bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is the ratio against the value recorded in
``bench_baseline.json`` (written on first run) — i.e. self-relative
progress across rounds.

Env knobs: BENCH_BATCH, BENCH_ITERS, BENCH_KNN_IMPL (auto|pallas|xla).
Also reports edges/s (k-NN edges built per second) to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    knn_impl = os.environ.get("BENCH_KNN_IMPL", "auto")
    mode = os.environ.get("BENCH_MODE", "eval")  # eval | train

    if mode == "train":
        bench_train(batch, iters, knn_impl)
        return

    import jax
    import jax.numpy as jnp

    from gkgnet_tpu.nn.classifier import GKGNetClassifier
    from gkgnet_tpu.ops.knn import set_knn_impl
    from gkgnet_tpu.utils.profiling import model_edge_count

    set_knn_impl(knn_impl)
    model = GKGNetClassifier(arch="s", n_classes=80, size=576,
                             dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 576, 576, 3), jnp.bfloat16)
    print(f"init on {jax.devices()[0]} ...", file=sys.stderr)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)[0]

    import numpy as np

    print("compile ...", file=sys.stderr)
    # Force a host readback: through remote-execution tunnels
    # block_until_ready can return at dispatch time, which would report
    # dispatch throughput instead of device throughput.
    try:
        np.asarray(fwd(variables, x))
    except Exception as e:
        if knn_impl == "xla":
            raise
        print(f"pallas path failed ({type(e).__name__}); retrying with "
              f"XLA kNN impl", file=sys.stderr)
        knn_impl = "xla"
        set_knn_impl("xla")
        fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False)[0])
        np.asarray(fwd(variables, x))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    np.asarray(out)  # device executes in-order; this drains the queue
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    eps = model_edge_count("s", 576, batch) * iters / dt
    print(f"{ips:.2f} img/s (batch={batch}, {dt/iters*1e3:.1f} ms/it, "
          f"knn={knn_impl}, {eps/1e6:.1f}M edges/s)", file=sys.stderr)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["value"]
    else:
        base = ips
        with open(baseline_path, "w") as f:
            json.dump({"metric": "images_per_sec_eval_576", "value": ips}, f)

    print(json.dumps({
        "metric": "images_per_sec_eval_576",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / base, 4),
    }))


def bench_train(batch: int, iters: int, knn_impl: str):
    """Training-step throughput (fwd + dual loss + bwd + AdamW + BN stats)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gkgnet_tpu.core.optim import build_optimizer
    from gkgnet_tpu.core.schedules import step_lr_with_warmup
    from gkgnet_tpu.core.trainer import create_train_state, make_train_step
    from gkgnet_tpu.nn.classifier import GKGNetClassifier
    from gkgnet_tpu.ops.knn import set_knn_impl
    from gkgnet_tpu.utils.profiling import model_edge_count

    set_knn_impl(knn_impl)
    model = GKGNetClassifier(arch="s", n_classes=80, size=576,
                             drop_path=0.1, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, 576, 576, 3), jnp.bfloat16)
    gt = jnp.zeros((batch, 80), jnp.float32)
    print(f"init on {jax.devices()[0]} ...", file=sys.stderr)
    state = create_train_state(model, jax.random.PRNGKey(0), x,
                               optax.sgd(1e-3), ema=True)
    sched = step_lr_with_warmup(1e-4, 1000, [10, 50], warmup_iters=5000)
    tx = build_optimizer(state.params, sched)
    state = state.replace(opt_state=tx.init(state.params))
    train_step = make_train_step(model, tx, lr_schedule=sched,
                                 ema_momentum=2e-4)

    batch_dict = {"img": x, "gt_label": gt}
    rng = jax.random.PRNGKey(1)
    print("compile ...", file=sys.stderr)
    state, logs = train_step(state, batch_dict, rng)
    np.asarray(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = train_step(state, batch_dict, rng)
    np.asarray(logs["loss"])
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    eps = model_edge_count("s", 576, batch) * iters / dt
    print(f"train: {ips:.2f} img/s ({dt/iters*1e3:.1f} ms/step, "
          f"{eps/1e6:.1f}M edges/s)", file=sys.stderr)
    print(json.dumps({
        "metric": "images_per_sec_train_576",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
