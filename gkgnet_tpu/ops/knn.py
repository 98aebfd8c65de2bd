"""Dynamic k-NN graph construction — jnp reference implementations.

Behavioral contract follows the reference graph core
(`/root/reference/mmcls/models/backbones/vig_model/torch_edge.py`):

  * features are L2-normalized along the channel dim before the distance
    (torch_edge.py:166-175),
  * squared-euclidean distance ``|x|^2 - 2 x.y + |y|^2`` accumulated in fp32
    with gradients stopped (graph build is non-differentiable on the live
    path, torch_edge.py:9-51),
  * optional additive bias (the negated relative-position table) added to the
    distance before top-k (torch_edge.py:74-82),
  * neighbors = top-k of the *negated* distance (torch_edge.py:76,83,104),
  * dilation takes every d-th neighbor of the k*d candidates; stochastic mode
    instead takes a random subset with probability eps at train time
    (torch_edge.py:126-149).

TPU-first design notes:
  * node tensors are channel-last ``(B, N, C)`` so the distance is a single
    large MXU matmul; fp32 ``preferred_element_type`` keeps accuracy with
    bf16 inputs.
  * the query axis can be tiled (``query_chunk``) with a sequential
    ``lax.map`` so the full ``(B, N, M)`` distance matrix never materializes
    (replaces the reference's ``n_part=10000`` host loop,
    torch_edge.py:65-78) — same results, bounded HBM.
  * a fused Pallas distance+top-k kernel (gkgnet_tpu/ops/pallas/knn_topk.py)
    is used on TPU when ``use_pallas`` is enabled; this module is the
    numerics contract it must meet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# kNN build implementation: 'auto' picks the fused Pallas kernel on TPU
# (single-device or pure-DP meshes) and the chunked XLA path elsewhere.
_KNN_IMPL = "auto"


def set_knn_impl(impl: str):
    """'auto' | 'pallas' | 'xla'."""
    global _KNN_IMPL
    assert impl in ("auto", "pallas", "xla"), impl
    _KNN_IMPL = impl


def _pallas_enabled() -> bool:
    if _KNN_IMPL == "pallas":
        return True
    if _KNN_IMPL == "xla":
        return False
    # auto: TPU backend, and not under an active graph-axis sharding context
    # (GSPMD cannot partition the kernel over the query axis; the graph
    # convs route through the explicit shard_map paths in
    # parallel/edge_partition.py there, and anything that still reaches
    # this XLA path shards cleanly under GSPMD).
    try:
        from gkgnet_tpu.parallel.sharding import graph_axis_size

        if graph_axis_size() > 1:
            return False
    except Exception:
        pass
    return jax.default_backend() in ("tpu", "axon")


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """L2-normalize along ``axis`` (torch ``F.normalize(p=2)`` semantics:
    divide by ``max(||x||, eps)``)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def pairwise_sqdist(x: Array, y: Array) -> Array:
    """Squared euclidean distances between two node sets.

    Args:
      x: queries ``(B, N, C)``.
      y: targets ``(B, M, C)``.
    Returns:
      ``(B, N, M)`` fp32 distances (gradients stopped).
    """
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    # Always fp32 operands + HIGHEST here. A bf16 DEFAULT dot with
    # preferred_element_type=fp32 *should* be exactly fp32-accumulated (and
    # is, inside the Pallas kernels — verified against an fp64 oracle,
    # tools/exp_kernel_phases.py), but the XLA TPU lowering of this
    # (non-Pallas) path was measured rounding the accumulation to bf16:
    # neighbor orderings violated fp64 truth across gaps up to 3.4e-3
    # (bf16 ulp scale) in ~20% of rows. This path is the correctness
    # fallback/oracle, so it pays the 6-pass fp32 dot.
    inner = jax.lax.dot_general(
        x.astype(jnp.float32), y.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, N, M)
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    x_sq = jnp.sum(jnp.square(x32), axis=-1, keepdims=True)      # (B, N, 1)
    y_sq = jnp.sum(jnp.square(y32), axis=-1, keepdims=True)      # (B, M, 1)
    return x_sq - 2.0 * inner + jnp.swapaxes(y_sq, 1, 2)


def _topk_neighbors(dist: Array, k: int) -> Array:
    """Indices of the k smallest distances along the last axis."""
    _, idx = jax.lax.top_k(-dist, k)
    return idx.astype(jnp.int32)


def knn_graph(
    x: Array,
    y: Array | None = None,
    *,
    k: int,
    bias: Array | None = None,
    normalize: bool = True,
    query_chunk: int | None = None,
) -> Array:
    """Build a dense k-NN edge set: for every query node the indices of its
    ``k`` nearest target nodes.

    Args:
      x: query nodes ``(B, N, C)``.
      y: target nodes ``(B, M, C)``; ``None`` for self-kNN (y = x).
      k: neighbors per query (the reference passes ``k * dilation`` here).
      bias: optional additive distance bias ``(N, M)`` or ``(B, N, M)``
        (the negated relative-position table).
      normalize: L2-normalize features first (live-path behavior).
      query_chunk: if set and it divides N, tile the query axis in chunks of
        this size (sequential scan) to bound memory.

    Returns:
      neighbor indices ``(B, N, k) int32`` into the target set.
    """
    if normalize:
        x = l2_normalize(x)
        y = l2_normalize(y) if y is not None else None
    if y is None:
        y = x
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)

    if _pallas_enabled():
        from gkgnet_tpu.ops.pallas.knn_topk import knn_topk, topk_fits

        b2 = bias
        if b2 is not None and b2.ndim == 3:
            if b2.shape[0] != 1:
                b2 = None  # batched bias: fall through to the XLA path
            else:
                b2 = b2[0]
        if (bias is None or b2 is not None) and topk_fits(
                x.shape[1], y.shape[1], k, d=x.shape[2],
                itembytes=jnp.dtype(x.dtype).itemsize):
            return knn_topk(x, y, k=k, bias=b2)

    n = x.shape[1]
    if bias is not None and bias.ndim == 2:
        bias = bias[None]

    if query_chunk is None or n % query_chunk != 0 or n == query_chunk:
        dist = pairwise_sqdist(x, y)
        if bias is not None:
            dist = dist + bias
        return _topk_neighbors(dist, k)

    num_chunks = n // query_chunk
    xc = x.reshape(x.shape[0], num_chunks, query_chunk, x.shape[2])
    xc = jnp.swapaxes(xc, 0, 1)  # (num_chunks, B, chunk, C)
    if bias is not None:
        bc = bias.reshape(bias.shape[0], num_chunks, query_chunk, bias.shape[2])
        bc = jnp.swapaxes(bc, 0, 1)  # (num_chunks, Bb, chunk, M)

        def step(args):
            xi, bi = args
            return _topk_neighbors(pairwise_sqdist(xi, y) + bi, k)

        idx = jax.lax.map(step, (xc, bc))
    else:
        idx = jax.lax.map(lambda xi: _topk_neighbors(pairwise_sqdist(xi, y), k), xc)
    idx = jnp.swapaxes(idx, 0, 1)  # (B, num_chunks, chunk, k)
    return idx.reshape(x.shape[0], n, k)


def dilate_edges(
    idx: Array,
    *,
    dilation: int,
    stochastic: bool = False,
    epsilon: float = 0.0,
    rng: Array | None = None,
    training: bool = False,
) -> Array:
    """Subsample ``k*d`` neighbor candidates down to ``k``.

    Deterministic mode takes every d-th candidate (``[:, :, ::d]``,
    torch_edge.py:146-148). Stochastic mode: with probability ``epsilon``
    (one draw for the whole call, matching ``torch.rand(1) < eps``,
    torch_edge.py:140-145) take a random permutation's first k instead —
    train-time only.
    """
    if dilation <= 1 and not (stochastic and training):
        return idx
    kd = idx.shape[-1]
    k = kd // max(dilation, 1)
    strided = idx[..., ::dilation]
    if not (stochastic and training and epsilon > 0.0):
        return strided
    if rng is None:
        raise ValueError("stochastic dilation at train time requires an rng key")
    rng_gate, rng_perm = jax.random.split(rng)
    use_random = jax.random.uniform(rng_gate, ()) < epsilon
    randsel = jax.random.permutation(rng_perm, kd)[:k]
    return jnp.where(use_random, idx[..., randsel], strided)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_graph_jit(x: Array, y: Array, *, k: int) -> Array:
    """Convenience jitted self/cross kNN used by tests and benchmarks."""
    return knn_graph(x, y, k=k)
