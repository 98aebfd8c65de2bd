"""Native C++ fastops: build, parity vs numpy, fallback behavior."""

import numpy as np
import pytest

from gkgnet_tpu import native

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def numpy_norm(img):
    return (img.astype(np.float32) - np.asarray(MEAN, np.float32)) \
        / np.asarray(STD, np.float32)


@pytest.fixture(scope="module")
def ops():
    mod = native.get_fastops()
    if mod is None:
        pytest.skip("native toolchain unavailable")
    return mod


def test_normalize_parity(ops):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    got = native.normalize_u8(img, MEAN, STD)
    np.testing.assert_allclose(got, numpy_norm(img), atol=1e-5)
    assert got.dtype == np.float32


def test_collate_parity(ops):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
            for _ in range(5)]
    got = native.collate_normalize(imgs, MEAN, STD)
    want = np.stack([numpy_norm(i) for i in imgs])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fallback_on_float_input():
    img = np.random.default_rng(2).standard_normal((8, 8, 3)).astype(np.float32)
    got = native.normalize_u8(img, MEAN, STD)
    np.testing.assert_allclose(got, numpy_norm(img), atol=1e-5)


def test_shape_mismatch_raises(ops):
    out = np.empty((2, 4, 4, 3), np.float32)
    bad = [np.zeros((4, 4, 3), np.uint8), np.zeros((3, 4, 3), np.uint8)]
    with pytest.raises(ValueError):
        ops.collate_normalize(bad, MEAN, STD, out)
