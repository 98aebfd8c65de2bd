"""Bicubic interpolation with torch ``F.interpolate(mode='bicubic',
align_corners=False)`` semantics (Keys kernel, A=-0.75, no antialias).

Host-side (numpy): used to build static tables at model-construction time —
the relative-position distance bias (torch_vertex.py:311-314) — and by the
torch-checkpoint converter. Exposed as matrices so the resize is a pair of
(MXU-friendly, if ever moved on-device) matmuls.
"""

from __future__ import annotations

import numpy as np

_A = -0.75  # torch/OpenCV bicubic coefficient


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1.0
    m2 = (x > 1.0) & (x < 2.0)
    out[m1] = ((_A + 2.0) * x[m1] - (_A + 3.0)) * x[m1] ** 2 + 1.0
    out[m2] = _A * (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0)
    return out


def bicubic_resize_matrix(n_in: int, n_out: int, dtype=np.float64) -> np.ndarray:
    """Dense 1D resize matrix ``W (n_out, n_in)`` such that
    ``out = W @ in`` reproduces torch bicubic (align_corners=False) along
    one axis. Border taps are clamped (replicate padding), matching torch."""
    scale = n_in / n_out
    i = np.arange(n_out, dtype=np.float64)
    src = (i + 0.5) * scale - 0.5
    fl = np.floor(src)
    t = src - fl
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for tap in range(-1, 3):
        tap_idx = np.clip(fl + tap, 0, n_in - 1).astype(np.int64)
        weight = _cubic_kernel(t - tap)
        np.add.at(w, (np.arange(n_out), tap_idx), weight)
    return w.astype(dtype)


def resize_bicubic_torch(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize the last two axes of ``img`` with torch-bicubic semantics."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    out = img.astype(np.float64)
    if out_h != in_h:
        wr = bicubic_resize_matrix(in_h, out_h)
        out = np.einsum("oi,...iw->...ow", wr, out)
    if out_w != in_w:
        wc = bicubic_resize_matrix(in_w, out_w)
        out = np.einsum("oi,...hi->...ho", wc, out)
    return out.astype(img.dtype)
