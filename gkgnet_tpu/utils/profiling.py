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


def model_flops(arch: str, size: int, batch: int = 1, k: int = 9,
                k_label: int = 9, num_group: int = 2, n_classes: int = 80,
                num_gcn: int = 1, count_impl: bool = False) -> dict:
    """Closed-form forward-pass FLOPs (multiply+add = 2) per component.

    The model is convs/matmuls end to end, so the count is exact:
    stem/downsample 3x3 convs, per-block fc1/fc2 1x1 convs, the grouped
    BasicConv, the 4x FFN, the kNN distance matmul (2*N*M*C per block after
    group folding: g groups of C/g dims), and the label pathway. With
    ``count_impl=True`` the fused kernel's one-hot gather matmuls
    (k extra N*M*C-sized passes per block) are included — the flops the TPU
    actually executes on the fused path (roofline denominator), vs the
    model-useful flops (MFU denominator).

    Geometry: gkgnet.py:122-149 (t/s/b settings), REDUCE_RATIOS (4,2,1,1),
    per-block dilation min(idx//4+1, 49//k).
    """
    from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS, REDUCE_RATIOS

    opt = ARCH_SETTINGS[arch]
    blocks, channels = opt["blocks"], opt["channels"]
    c0 = channels[0]
    s2, s4 = (size // 2) ** 2, (size // 4) ** 2
    fl = {}
    # stem: 3->c0/2 (3x3, s2), c0/2->c0 (3x3, s2), c0->c0 (3x3, s1)
    fl["stem"] = 2 * 9 * (3 * (c0 // 2) * s2 + (c0 // 2) * c0 * s4
                          + c0 * c0 * s4)

    n = s4
    grapher_idx = 0
    label_flops = 0
    max_dil = 49 // k
    lcur = n_classes
    for i, nb in enumerate(blocks):
        c = channels[i]
        if i > 0:
            n //= 4
            fl[f"downsample{i}"] = 2 * 9 * channels[i - 1] * c * n
        r = REDUCE_RATIOS[i]
        m = n // (r * r)
        stage = 0
        for _ in range(nb):
            dil = min(grapher_idx // 4 + 1, max_dil)
            kd = k * dil
            stage += 2 * n * c * c                 # fc1
            stage += 2 * n * m * c                 # distance matmul (g*N*M*C/g)
            if count_impl:
                stage += 2 * k * n * m * c         # one-hot gather matmuls
            stage += 2 * n * (2 * c) * (2 * c) // 4  # BasicConv groups=4
            stage += 2 * n * (2 * c) * c           # fc2
            stage += 16 * n * c * c                # FFN c->4c->c (2 MACs x 2 matmuls x 4c)
            grapher_idx += 1
        fl[f"stage{i}"] = stage
        # label tap at stage end
        n_label = num_gcn if i == len(blocks) - 1 else 1
        lt = 0
        for _ in range(n_label):
            lt += 2 * n_classes * c * c            # fc1
            lt += 2 * n_classes * n * c            # cross distance
            if count_impl:
                lt += 2 * k_label * n_classes * n * c
            lt += 2 * n_classes * (2 * c) * (2 * c) // 4
            lt += 2 * n_classes * (2 * c) * c      # fc2
            lt += 16 * n_classes * c * c           # FFNLabel
        if i < len(blocks) - 1:
            lt += 2 * n_classes * c * channels[i + 1]  # label projection
        label_flops += lt
    fl["label_path"] = label_flops
    fl["head"] = 2 * n_classes * channels[-1] * 2
    fl["total"] = sum(fl.values())
    fl["per_image_total"] = fl["total"]
    fl["total"] *= batch
    return fl


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
