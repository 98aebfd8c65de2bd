"""Profiling + roofline counters (reference has only an iter-timer + an mmcv
flops hook, SURVEY §5.1; here: jax.profiler traces and first-class
edges/s / images/s metrics)."""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TPU/XLA profile viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def model_edge_count(arch: str, size: int, batch: int, k: int = 9,
                     k_label: int = 9, num_group: int = 2,
                     n_classes: int = 80, num_gcn: int = 1) -> int:
    """Edges built per forward pass: every Grapher block contributes
    BG * N * k spatial edges (post-dilation k, reference k fixed at 9) and
    every label GCN BG * n_classes * k_label cross edges."""
    blocks = (2, 2, 6, 2)
    bg = batch * num_group
    hw = size // 4
    n = hw * hw
    edges = 0
    label_taps = 0
    for i, nb in enumerate(blocks):
        edges += nb * bg * n * k
        n_label = num_gcn if i == len(blocks) - 1 else 1
        label_taps += n_label
        n //= 4
    edges += label_taps * bg * n_classes * k_label
    return edges


def timeit(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median wall time per call with forced host readback (honest through
    remote-execution tunnels)."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
