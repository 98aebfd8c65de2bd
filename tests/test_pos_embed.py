"""Relative-position table + bicubic resize parity vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

from gkgnet_tpu.ops.interpolate import resize_bicubic_torch, bicubic_resize_matrix
from gkgnet_tpu.ops.pos_embed import (
    get_2d_relative_pos_embed,
    get_relative_pos_table,
)


def test_bicubic_matches_torch_down_and_up():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 24, 36)).astype(np.float32)
    for oh, ow in [(12, 9), (48, 72), (24, 9), (7, 5)]:
        got = resize_bicubic_torch(img, oh, ow)
        want = F.interpolate(
            torch.from_numpy(img), size=(oh, ow), mode="bicubic", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_same_size_bicubic_is_identity():
    w = bicubic_resize_matrix(17, 17)
    np.testing.assert_allclose(w, np.eye(17), atol=1e-12)


def test_relative_pos_table_matches_reference_pipeline():
    # reference pipeline: full (n, n) table -> torch bicubic to (n, n/r^2)
    # -> negate (torch_vertex.py:308-315). Ours: fused P @ (W P)^T.
    dim, n, r = 20, 64, 2
    full = get_2d_relative_pos_embed(dim, 8)  # (64, 64)
    want = -F.interpolate(
        torch.from_numpy(full[None, None].astype(np.float32)),
        size=(n, n // (r * r)),
        mode="bicubic",
        align_corners=False,
    ).numpy()[0, 0]
    got = get_relative_pos_table(dim, n, r)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_relative_pos_table_no_reduction():
    dim, n = 12, 16
    got = get_relative_pos_table(dim, n, 1)
    want = -get_2d_relative_pos_embed(dim, 4)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)
    assert got.shape == (n, n)
