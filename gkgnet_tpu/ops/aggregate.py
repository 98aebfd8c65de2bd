"""Neighbor gather + graph aggregation primitives.

Contract follows the reference aggregators
(`/root/reference/mmcls/models/backbones/vig_model/torch_vertex.py` and the
flat gather `torch_nn.py:84-105`), re-laid-out channel-last for TPU:

  * ``gather_nodes``:   x_j = y[idx]  — ``(B, M, C)`` gathered with
    ``(B, N, k)`` indices into ``(B, N, k, C)``.
  * ``max_relative``:   max_k(x_j - x_i) — the 'mr' aggregation
    (torch_vertex.py:47-62); the pairing with the center features uses the
    reference's *channel-interleaved* concat (stack along a new axis after
    channel, then flatten: ``[x_0, m_0, x_1, m_1, ...]``), which matters for
    torch checkpoint parity because the following 1x1 conv is grouped.

The default gather path is ``jnp.take_along_axis`` (XLA gather). A fused
Pallas gather+aggregate kernel can replace it behind the same contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_nodes(y: Array, idx: Array) -> Array:
    """Gather neighbor features.

    Args:
      y: node features ``(B, M, C)``.
      idx: neighbor indices ``(B, N, k)`` into the M axis.
    Returns:
      ``(B, N, k, C)`` neighbor features.
    """
    b, _, c = y.shape
    _, n, k = idx.shape
    flat = idx.reshape(b, n * k)
    out = jnp.take_along_axis(y, flat[:, :, None], axis=1)
    return out.reshape(b, n, k, c)


def interleave_channels(x: Array, m: Array) -> Array:
    """Channel-interleave two equal-shaped ``(..., C)`` tensors into
    ``(..., 2C)`` as ``[x_0, m_0, x_1, m_1, ...]`` — matches the reference's
    ``cat([x.unsqueeze(2), x_j.unsqueeze(2)], dim=2).reshape(b, 2c, ...)``
    channel ordering (torch_vertex.py:61)."""
    stacked = jnp.stack([x, m], axis=-1)  # (..., C, 2)
    return stacked.reshape(*x.shape[:-1], x.shape[-1] * 2)


def max_relative(x: Array, idx: Array, y: Array | None = None) -> Array:
    """Max-relative aggregation: ``max_k(x_j - x_i)`` per query node.

    Args:
      x: query/center nodes ``(B, N, C)``.
      idx: ``(B, N, k)`` neighbor indices into the target set.
      y: target nodes ``(B, M, C)``; ``None`` -> self (y = x).
    Returns:
      ``(B, N, C)`` aggregated relative features.
    """
    src = x if y is None else y
    x_j = gather_nodes(src, idx)               # (B, N, k, C)
    rel = x_j - x[:, :, None, :]               # broadcast centers
    return jnp.max(rel, axis=2)


def sum_neighbors(x: Array, idx: Array, y: Array | None = None) -> Array:
    """Sum aggregation over neighbors (GIN, torch_vertex.py:144-150)."""
    src = x if y is None else y
    return jnp.sum(gather_nodes(src, idx), axis=2)


def max_neighbors(x: Array, idx: Array, y: Array | None = None) -> Array:
    """Max aggregation over neighbor features (GraphSAGE inner step)."""
    src = x if y is None else y
    return jnp.max(gather_nodes(src, idx), axis=2)
