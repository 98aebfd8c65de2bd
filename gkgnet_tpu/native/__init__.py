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
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", out, "-pthread",
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
