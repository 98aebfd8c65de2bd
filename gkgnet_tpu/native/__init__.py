"""Native host-side ops (C++), with transparent build + numpy fallback.

``get_fastops()`` returns the compiled module or None. ``build()`` compiles
``fastops.cpp`` into this directory with the system toolchain (g++). The
data pipeline calls ``normalize_u8``/``collate_normalize`` through the
wrappers below, falling back to numpy when the extension is unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_fastops = None
_tried = False


def build(verbose: bool = False) -> bool:
    """Compile fastops.cpp -> _fastops.so next to this file."""
    src = os.path.join(_THIS_DIR, "fastops.cpp")
    out = os.path.join(_THIS_DIR, "_fastops.so")
    include = sysconfig.get_path("include")
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
        "-fPIC", "-std=c++17", f"-I{include}", src, "-o", out, "-pthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose or res.returncode != 0:
            sys.stderr.write(res.stdout + res.stderr)
        return res.returncode == 0
    except Exception as e:  # toolchain missing
        if verbose:
            sys.stderr.write(f"fastops build failed: {e}\n")
        return False


def get_fastops():
    global _fastops, _tried
    if _fastops is not None or _tried:
        return _fastops
    _tried = True
    so = os.path.join(_THIS_DIR, "_fastops.so")
    if not os.path.exists(so):
        if not build():
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_fastops", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _fastops = mod
    except Exception:
        _fastops = None
    return _fastops


def normalize_u8(img: np.ndarray, mean, std) -> np.ndarray:
    """uint8 (..., 3) -> normalized float32, GIL-free when native."""
    ops = get_fastops()
    if ops is not None and img.dtype == np.uint8 and img.flags.c_contiguous \
            and img.shape[-1] == 3:
        out = np.empty(img.shape, np.float32)
        ops.normalize_u8(img, [float(m) for m in mean],
                         [float(s) for s in std], out)
        return out
    return (img.astype(np.float32) - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)


def mix_chain(views: list[np.ndarray], plan: list[tuple]) -> np.ndarray:
    """CropMixup blend recursion over uint8 views (255-scale float32
    accumulator, truncating clip to uint8). ``plan`` entries are
    ``(lam, perm_side, p0, p1, p2)`` with perm_side 0=no permute,
    1=permute the incoming view, 2=permute the accumulator. GIL-free
    single pass per blend when native; numpy fallback is bit-identical
    (same float32 op order, same truncating cast)."""
    ops = get_fastops()
    if (ops is not None
            and all(v.dtype == np.uint8 and v.flags.c_contiguous
                    and v.shape == views[0].shape and v.shape[-1] == 3
                    for v in views)):
        out = np.empty(views[0].shape, np.uint8)
        ops.mix_chain(list(views),
                      [(float(lam), int(side), int(p0), int(p1), int(p2))
                       for lam, side, p0, p1, p2 in plan], out)
        return out
    buf = views[0].astype(np.float32)
    for (lam, side, p0, p1, p2), v in zip(plan, views[1:]):
        lam = np.float32(lam)
        inv = np.float32(1.0) - lam
        perm = [p0, p1, p2]
        if side == 0:
            buf = lam * buf + inv * v.astype(np.float32)
        elif side == 1:
            buf = lam * buf + inv * v[..., perm].astype(np.float32)
        else:
            buf = lam * buf[..., perm] + inv * v.astype(np.float32)
    return np.clip(buf, 0, 255).astype(np.uint8)


_L = np.array([0.299, 0.587, 0.114], np.float32)


def color_jitter(img: np.ndarray, ops: list[tuple]) -> np.ndarray:
    """brightness/contrast/saturation enhance chain over uint8 HWC RGB.
    ``ops`` = [(kind, factor)] with kind 0=brightness, 1=contrast,
    2=saturation; ITU-R 601 luma, clip after every op, round-to-nearest
    final store. GIL-free single float pass per op when native."""
    f = get_fastops()
    if f is not None and img.dtype == np.uint8 and img.flags.c_contiguous \
            and img.shape[-1] == 3:
        out = np.empty(img.shape, np.uint8)
        f.color_jitter(img, [(int(k), float(v)) for k, v in ops], out)
        return out
    buf = img.astype(np.float32)
    for kind, factor in ops:
        factor = np.float32(factor)
        inv = np.float32(1.0) - factor
        if kind == 0:
            buf = np.clip(buf * factor, 0, 255)
        elif kind == 1:
            mean = np.float32((buf @ _L).mean())
            buf = np.clip(factor * buf + inv * mean, 0, 255)
        else:
            luma = (buf @ _L)[..., None]
            buf = np.clip(factor * buf + inv * luma, 0, 255)
    return (np.clip(buf, 0, 255) + np.float32(0.5)).astype(np.uint8)


def collate_normalize(imgs: list[np.ndarray], mean, std) -> np.ndarray:
    """list of HWC uint8 (same shape) -> (B, H, W, 3) normalized float32."""
    ops = get_fastops()
    if (ops is not None and imgs
            and all(i.dtype == np.uint8 and i.flags.c_contiguous
                    and i.shape == imgs[0].shape and i.shape[-1] == 3
                    for i in imgs)):
        out = np.empty((len(imgs),) + imgs[0].shape, np.float32)
        ops.collate_normalize(list(imgs), [float(m) for m in mean],
                              [float(s) for s in std], out)
        return out
    return np.stack([normalize_u8(i, mean, std) for i in imgs])
