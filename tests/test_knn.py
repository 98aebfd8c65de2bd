"""Graph-core numerics: parity of the jnp kNN primitives against plain torch
implementations of the reference math (torch_edge.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gkgnet_tpu.ops import knn as K


def torch_knn_reference(x, y=None, k=9, bias=None):
    """Reference semantics: L2-normalize, squared dist, topk of -dist."""
    xt = F.normalize(torch.from_numpy(x), p=2.0, dim=-1)
    yt = xt if y is None else F.normalize(torch.from_numpy(y), p=2.0, dim=-1)
    x_sq = (xt * xt).sum(-1, keepdim=True)
    y_sq = (yt * yt).sum(-1, keepdim=True)
    dist = x_sq - 2 * torch.matmul(xt, yt.transpose(2, 1)) + y_sq.transpose(2, 1)
    if bias is not None:
        dist = dist + torch.from_numpy(bias)
    _, idx = torch.topk(-dist, k=k)
    return idx.numpy()


@pytest.mark.parametrize("cross", [False, True])
def test_knn_matches_torch(cross):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 16)).astype(np.float32)
    y = rng.standard_normal((2, 48, 16)).astype(np.float32) if cross else None
    idx = K.knn_graph(jnp.asarray(x), jnp.asarray(y) if cross else None, k=5)
    ref = torch_knn_reference(x, y, k=5)
    # compare as sets per query (tie order may differ between backends)
    got = np.sort(np.asarray(idx), axis=-1)
    want = np.sort(ref, axis=-1)
    np.testing.assert_array_equal(got, want)


def test_knn_with_bias():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 8)).astype(np.float32)
    bias = rng.standard_normal((32, 32)).astype(np.float32)
    idx = K.knn_graph(jnp.asarray(x), k=4, bias=jnp.asarray(bias))
    ref = torch_knn_reference(x, None, k=4, bias=bias[None])
    np.testing.assert_array_equal(
        np.sort(np.asarray(idx), -1), np.sort(ref, -1)
    )


def test_knn_chunked_matches_full():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 96, 12)).astype(np.float32)
    y = rng.standard_normal((2, 40, 12)).astype(np.float32)
    bias = rng.standard_normal((96, 40)).astype(np.float32)
    full = K.knn_graph(jnp.asarray(x), jnp.asarray(y), k=6, bias=jnp.asarray(bias))
    chunked = K.knn_graph(
        jnp.asarray(x), jnp.asarray(y), k=6, bias=jnp.asarray(bias), query_chunk=32
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_l2_normalize_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 10, 7)).astype(np.float32)
    x[0, 0] = 0.0  # eps path
    got = np.asarray(K.l2_normalize(jnp.asarray(x)))
    want = F.normalize(torch.from_numpy(x), p=2.0, dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pairwise_sqdist_values():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 20, 5)).astype(np.float32)
    y = rng.standard_normal((1, 30, 5)).astype(np.float32)
    d = np.asarray(K.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, atol=1e-4)


def test_dilate_strided():
    idx = jnp.arange(2 * 8 * 12).reshape(2, 8, 12).astype(jnp.int32)
    out = K.dilate_edges(idx, dilation=3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(idx)[..., ::3])


def test_dilate_stochastic_shapes_and_gate():
    idx = jnp.arange(2 * 8 * 12).reshape(2, 8, 12).astype(jnp.int32)
    # epsilon=1 -> always the random branch; result is a k-subset of candidates
    out = K.dilate_edges(
        idx, dilation=3, stochastic=True, epsilon=1.0,
        rng=jax.random.PRNGKey(0), training=True,
    )
    assert out.shape == (2, 8, 4)
    cand = np.asarray(idx)
    got = np.asarray(out)
    for b in range(2):
        for n in range(8):
            assert set(got[b, n]).issubset(set(cand[b, n]))
    # epsilon=0 -> deterministic strided even in training
    out2 = K.dilate_edges(
        idx, dilation=3, stochastic=True, epsilon=0.0,
        rng=jax.random.PRNGKey(0), training=True,
    )
    np.testing.assert_array_equal(np.asarray(out2), cand[..., ::3])
