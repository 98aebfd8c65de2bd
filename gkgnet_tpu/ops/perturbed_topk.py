"""Differentiable (perturbed) top-k — soft neighbor selection.

Reference: mmcls/models/utils/differentiable_topk.py (Berthet et al.
perturbed optimizers): at train time the top-k one-hot indicator is averaged
over Gaussian perturbations of the scores; the gradient is the
noise-weighted indicator expectation
``dY/dx = E[onehot x z] / (num_samples * sigma)``. At eval it is the hard
(sorted-indices) one-hot.

Used by the differentiable graph-build option
(DenseDilatedKnnGraphDifferentiable, torch_edge.py:107-202): instead of
integer edge indices, neighbors are gathered with an einsum against the
soft indicator — dead on the reference's live path but part of the API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def hard_topk_indicator(x: Array, k: int) -> Array:
    """(..., D) scores -> (..., k, D) one-hot of the top-k (indices sorted
    ascending, eval behavior of the reference)."""
    d = x.shape[-1]
    _, idx = jax.lax.top_k(x, k)
    idx = jnp.sort(idx, axis=-1)
    return jax.nn.one_hot(idx, d, dtype=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def perturbed_topk(x: Array, k: int, num_samples: int = 500,
                   sigma: float = 0.05, rng: Array | None = None) -> Array:
    """Soft top-k indicator (..., k, D); differentiable wrt x."""
    ind, _ = _perturbed_forward(x, k, num_samples, sigma, rng)
    return ind


def _perturbed_forward(x, k, num_samples, sigma, rng):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    d = x.shape[-1]
    noise = jax.random.normal(rng, (num_samples,) + x.shape, jnp.float32)
    perturbed = x[None].astype(jnp.float32) + noise * sigma
    _, idx = jax.lax.top_k(perturbed, k)          # (nS, ..., k)
    idx = jnp.sort(idx, axis=-1)
    onehot = jax.nn.one_hot(idx, d, dtype=jnp.float32)  # (nS, ..., k, D)
    return jnp.mean(onehot, axis=0), (onehot, noise)


def _fwd(x, k, num_samples, sigma, rng):
    ind, (onehot, noise) = _perturbed_forward(x, k, num_samples, sigma, rng)
    return ind, (onehot, noise)


def _bwd(k, num_samples, sigma, res, g):
    onehot, noise = res
    # expected_gradient[..., k, d] = E_s[onehot * z] / sigma
    expected = jnp.einsum("s...kd,s...d->...kd", onehot, noise) \
        / num_samples / sigma
    grad_x = jnp.einsum("...kd,...kd->...d", g, expected)
    return (grad_x, None)


perturbed_topk.defvjp(_fwd, _bwd)


def soft_knn_gather(x: Array, y: Array, k: int, *, num_samples: int = 20,
                    sigma: float = 0.1, dilation: int = 1,
                    rng: Array | None = None, training: bool = True) -> Array:
    """Differentiable cross-kNN gather
    (xy_dense_knn_matrix_differentiable + einsum gather,
    torch_edge.py:107-122, 177-202): returns soft neighbor features
    (B, N, k, C) — every ``dilation``-th of the k*dilation soft neighbors.
    """
    from gkgnet_tpu.ops.knn import l2_normalize, pairwise_sqdist

    xn = l2_normalize(x)
    yn = l2_normalize(y)
    dist = pairwise_sqdist(xn, yn)                     # (B, N, M), no grad
    kd = k * dilation
    if training:
        ind = perturbed_topk(-dist, kd, num_samples, sigma, rng)
    else:
        ind = hard_topk_indicator(-dist, kd)
    # the reference einsums against the NORMALIZED targets (y is rebound to
    # F.normalize(y) before xy_dense_knn_matrix_differentiable,
    # torch_edge.py:193-199)
    x_j = jnp.einsum("bmkn,bnc->bmkc", ind, yn.astype(jnp.float32))
    return x_j[:, :, ::dilation, :]
