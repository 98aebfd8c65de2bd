"""Perturbed top-k parity vs the reference torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gkgnet_tpu.ops.perturbed_topk import (
    hard_topk_indicator, perturbed_topk, soft_knn_gather)


def test_hard_indicator_matches_torch_eval_path():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 12)).astype(np.float32)
    got = np.asarray(hard_topk_indicator(jnp.asarray(x), 3))
    idx = torch.topk(torch.from_numpy(x), k=3, sorted=False).indices
    idx = torch.sort(idx, dim=-1).values
    want = torch.nn.functional.one_hot(idx, 12).float().numpy()
    np.testing.assert_array_equal(got, want)


def test_perturbed_forward_is_distribution_over_topk():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10)), jnp.float32)
    ind = np.asarray(perturbed_topk(x, 3, 200, 0.05, jax.random.PRNGKey(0)))
    assert ind.shape == (2, 3, 10)
    # rows sum to 1 (average of one-hots)
    np.testing.assert_allclose(ind.sum(-1), 1.0, atol=1e-5)
    # with tiny sigma it concentrates on the hard top-k
    hard = np.asarray(hard_topk_indicator(x, 3))
    ind_tight = np.asarray(perturbed_topk(x, 3, 200, 1e-4,
                                          jax.random.PRNGKey(0)))
    np.testing.assert_allclose(ind_tight, hard, atol=0.05)


def test_perturbed_backward_matches_torch_formula():
    """Gradient parity vs the reference einsum backward with the SAME noise."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    k, ns, sigma = 2, 50, 0.1
    key = jax.random.PRNGKey(3)
    g = rng.standard_normal((3, k, 8)).astype(np.float32)

    grad = jax.grad(
        lambda x_: jnp.sum(perturbed_topk(x_, k, ns, sigma, key) *
                           jnp.asarray(g)))(jnp.asarray(x))

    # replicate with the same jax noise in torch-style numpy math
    noise = np.asarray(jax.random.normal(key, (ns, 3, 8), jnp.float32))
    perturbed = x[None] + noise * sigma
    idx = np.argsort(-perturbed, axis=-1)[..., :k]
    idx = np.sort(idx, axis=-1)
    onehot = np.eye(8, dtype=np.float32)[idx]  # (ns, 3, k, 8)
    expected = np.einsum("sbkd,sbd->bkd", onehot, noise) / ns / sigma
    want = np.einsum("bkd,bkd->bd", g, expected)
    np.testing.assert_allclose(np.asarray(grad), want, atol=1e-4)


def test_soft_knn_gather_eval_matches_hard_gather():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 5)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 14, 5)), jnp.float32)
    got = np.asarray(soft_knn_gather(x, y, k=3, training=False))
    from gkgnet_tpu.ops.aggregate import gather_nodes
    from gkgnet_tpu.ops.knn import knn_graph, l2_normalize

    idx = np.sort(np.asarray(knn_graph(x, y, k=3)), axis=-1)
    # the reference einsums the soft indicator against the NORMALIZED
    # targets (torch_edge.py:193-199)
    want = np.asarray(gather_nodes(l2_normalize(y), jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, atol=1e-5)
