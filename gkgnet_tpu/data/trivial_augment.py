"""TrivialAugment (fixed_standard space) — reference
datasets/pipelines/aug_lib.py:346-624.

One op sampled uniformly from the 14-op standard list, one strength level
sampled uniformly in [0, 30]; 'fixed_standard' ranges: posterize bits in
[4, 8], shear max 0.3, translate max 10 px, rotate max 30 deg,
solarize max 256, enhancers in [0.1, 1.9].

All randomness comes from an explicit ``np.random.Generator`` so the host
pipeline is reproducible (multi-host determinism, SURVEY hard part #4).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

PARAMETER_MAX = 30

SHEAR_MAX = 0.3
TRANSLATE_MAX = 10
ROTATE_MAX = 30
SOLARIZE_MAX = 256
POSTERIZE_MIN, POSTERIZE_MAX = 4, 8
ENHANCER_MIN, ENHANCER_MAX = 0.1, 1.9


def _float_param(level, maxval):
    return float(level) * maxval / PARAMETER_MAX


def _int_param(level, maxval):
    return int(level * maxval / PARAMETER_MAX)


def _signed(value, rng):
    return -value if rng.random() > 0.5 else value


def _identity(img, level, rng):
    return img


def _auto_contrast(img, level, rng):
    return ImageOps.autocontrast(img)


def _equalize(img, level, rng):
    return ImageOps.equalize(img)


def _rotate(img, level, rng):
    return img.rotate(_signed(_int_param(level, ROTATE_MAX), rng))


def _solarize(img, level, rng):
    return ImageOps.solarize(img, 256 - _int_param(level, SOLARIZE_MAX))


def _posterize(img, level, rng):
    level = _int_param(level, POSTERIZE_MAX - POSTERIZE_MIN)
    return ImageOps.posterize(img, POSTERIZE_MAX - level)


def _enhancer(enhancer_cls):
    def op(img, level, rng):
        v = _float_param(level, ENHANCER_MAX - ENHANCER_MIN) + ENHANCER_MIN
        return enhancer_cls(img).enhance(v)

    return op


def _shear_x(img, level, rng):
    v = _signed(_float_param(level, SHEAR_MAX), rng)
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0))


def _shear_y(img, level, rng):
    v = _signed(_float_param(level, SHEAR_MAX), rng)
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0))


def _translate_x(img, level, rng):
    v = _signed(_int_param(level, TRANSLATE_MAX), rng)
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0))


def _translate_y(img, level, rng):
    v = _signed(_int_param(level, TRANSLATE_MAX), rng)
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v))


STANDARD_OPS = [
    ("identity", _identity),
    ("auto_contrast", _auto_contrast),
    ("equalize", _equalize),
    ("rotate", _rotate),
    ("solarize", _solarize),
    ("color", _enhancer(ImageEnhance.Color)),
    ("posterize", _posterize),
    ("contrast", _enhancer(ImageEnhance.Contrast)),
    ("brightness", _enhancer(ImageEnhance.Brightness)),
    ("sharpness", _enhancer(ImageEnhance.Sharpness)),
    ("shear_x", _shear_x),
    ("shear_y", _shear_y),
    ("translate_x", _translate_x),
    ("translate_y", _translate_y),
]


class TrivialAugment:
    def __call__(self, img: Image.Image, rng: np.random.Generator) -> Image.Image:
        _, op = STANDARD_OPS[rng.integers(len(STANDARD_OPS))]
        level = int(rng.integers(0, PARAMETER_MAX + 1))
        return op(img, level, rng)


class RandAugment:
    """n ops at fixed magnitude m (aug_lib.py:625-636)."""

    def __init__(self, n: int, m: int):
        self.n, self.m = n, m

    def __call__(self, img, rng):
        for _ in range(self.n):
            _, op = STANDARD_OPS[rng.integers(len(STANDARD_OPS))]
            img = op(img, self.m, rng)
        return img
