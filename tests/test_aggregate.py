"""Gather/aggregate parity vs a plain-torch implementation of the reference's
batched_index_select + max-relative (torch_nn.py:84-105, torch_vertex.py:47-61)."""

import jax.numpy as jnp
import numpy as np
import torch

from gkgnet_tpu.ops import aggregate as A


def torch_batched_index_select(x_bcn, idx_bnk):
    """Reference gather; x (B, C, M), idx (B, N, k) -> (B, C, N, k)."""
    x = torch.from_numpy(x_bcn)
    idx = torch.from_numpy(idx_bnk.astype(np.int64))
    b, c, m = x.shape
    _, n, k = idx.shape
    idx_base = torch.arange(b).view(-1, 1, 1) * m
    flat = (idx + idx_base).reshape(-1)
    feat = x.transpose(2, 1).contiguous().view(b * m, c)[flat]
    return feat.view(b, n, k, c).permute(0, 3, 1, 2).numpy()


def test_gather_matches_reference():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((3, 25, 6)).astype(np.float32)
    idx = rng.integers(0, 25, size=(3, 10, 4)).astype(np.int32)
    got = np.asarray(A.gather_nodes(jnp.asarray(y), jnp.asarray(idx)))
    want = torch_batched_index_select(np.transpose(y, (0, 2, 1)), idx)
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-6)


def test_max_relative_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 5)).astype(np.float32)
    y = rng.standard_normal((2, 30, 5)).astype(np.float32)
    idx = rng.integers(0, 30, size=(2, 12, 3)).astype(np.int32)
    got = np.asarray(A.max_relative(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(y)))
    x_i = np.repeat(x[:, :, None, :], 3, axis=2)
    x_j = torch_batched_index_select(np.transpose(y, (0, 2, 1)), idx)
    x_j = np.transpose(x_j, (0, 2, 3, 1))
    want = (x_j - x_i).max(axis=2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_interleave_channel_order():
    x = jnp.asarray(np.array([[[1.0, 2.0, 3.0]]]))
    m = jnp.asarray(np.array([[[10.0, 20.0, 30.0]]]))
    out = np.asarray(A.interleave_channels(x, m))
    np.testing.assert_array_equal(out[0, 0], [1.0, 10.0, 2.0, 20.0, 3.0, 30.0])


def test_sum_and_max_neighbors():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((1, 9, 4)).astype(np.float32)
    idx = rng.integers(0, 9, size=(1, 5, 3)).astype(np.int32)
    g = np.asarray(A.gather_nodes(jnp.asarray(y), jnp.asarray(idx)))
    np.testing.assert_allclose(
        np.asarray(A.sum_neighbors(jnp.asarray(y), jnp.asarray(idx), jnp.asarray(y))),
        g.sum(2), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A.max_neighbors(jnp.asarray(y), jnp.asarray(idx), jnp.asarray(y))),
        g.max(2), atol=1e-6)
