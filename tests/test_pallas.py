"""Pallas kernel contract tests (interpret mode on CPU; the same tests run
compiled on real TPU via BENCH/TPU jobs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gkgnet_tpu.ops.knn import knn_graph, l2_normalize
from gkgnet_tpu.ops.pallas.knn_topk import knn_topk


@pytest.mark.parametrize("shape", [
    (2, 64, 16, 48, 5),    # cross, unaligned M
    (1, 100, 12, 100, 7),  # self-size, N not multiple of tile
    (4, 33, 8, 20, 4),     # tiny odd sizes
])
def test_knn_topk_matches_reference(shape):
    bg, n, d, m, k = shape
    rng = np.random.default_rng(0)
    x = l2_normalize(jnp.asarray(rng.standard_normal((bg, n, d)), jnp.float32))
    y = l2_normalize(jnp.asarray(rng.standard_normal((bg, m, d)), jnp.float32))
    ref = knn_graph(x, y, k=k, normalize=False)
    got = knn_topk(x, y, k=k, tile_n=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_knn_topk_with_bias_matches_reference():
    bg, n, d, m, k = 2, 48, 10, 36, 6
    rng = np.random.default_rng(1)
    x = l2_normalize(jnp.asarray(rng.standard_normal((bg, n, d)), jnp.float32))
    y = l2_normalize(jnp.asarray(rng.standard_normal((bg, m, d)), jnp.float32))
    bias = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    ref = knn_graph(x, y, k=k, bias=bias, normalize=False)
    got = knn_topk(x, y, k=k, bias=bias, tile_n=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_knn_topk_self_knn():
    bg, n, d, k = 2, 40, 6, 5
    rng = np.random.default_rng(2)
    x = l2_normalize(jnp.asarray(rng.standard_normal((bg, n, d)), jnp.float32))
    ref = knn_graph(x, None, k=k, normalize=False)
    got = knn_topk(x, x, k=k, tile_n=40, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # every node's own index should be its first neighbor (distance 0)
    np.testing.assert_array_equal(
        np.asarray(got)[:, :, 0], np.tile(np.arange(n), (bg, 1)))


def test_knn_topk_tie_breaking_lowest_index():
    # duplicate targets -> equal distances; lowest index must win
    x = jnp.ones((1, 8, 4), jnp.float32)
    y = jnp.concatenate([jnp.ones((1, 3, 4)), jnp.zeros((1, 5, 4))], 1)
    got = np.asarray(knn_topk(x, y, k=3, tile_n=8, interpret=True))
    np.testing.assert_array_equal(got[0, 0], [0, 1, 2])
