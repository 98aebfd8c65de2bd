"""Fused pairwise-distance + top-k Pallas TPU kernel.

Replaces the XLA path "materialize (BG, N, M) distances in HBM -> sort"
(and the reference's chunked host loop, torch_edge.py:54-86) with one pass:
each grid step loads a query tile and the full target set into VMEM,
runs the distance matmul on the MXU with fp32 accumulation, adds the
relative-position bias, and keeps a running k-best *in VMEM/registers* via
iterative masked argmin — the full distance matrix never touches HBM.

HBM traffic per layer drops from ~2 x BG*N*M*4 bytes (write + sort read) to
just the inputs + bias + (BG, N, k) indices, which is what makes the k-NN
build HBM-bound -> compute-bound on TPU.

Tie-breaking matches torch.topk/lax.top_k on the live path: the smallest
index among equal distances wins (first-occurrence argmin).

Contract-tested against ops/knn.knn_graph (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_VMEM_CAP = 100 * 1024 * 1024  # v5e/v5p physical VMEM is 128 MiB


def _scoped_vmem_bytes(tile_t: int, m: int, k: int,
                       d: int = 0, itembytes: int = 4) -> int:
    """Scoped-VMEM model (see knn_mr._scoped_vmem_bytes): the (T, M) fp32
    distance matrix lives in one explicit scratch buffer masked in place
    under a fori_loop, so usage is O(T*M) independent of k, plus the
    (M, D) target tile (double-buffered by the pipeline: measured 79.39M =
    2*26.5M(y) + 4*6.6M(dist) at T=80, M=20736, D=320 fp32)."""
    del k
    return 5 * tile_t * m * 4 + 2 * m * d * itembytes


def topk_fits(n: int, m: int, k: int, tile_n: int = 256,
              d: int = 0, itembytes: int = 4) -> bool:
    t = min(tile_n, _round_up(n, 8))
    return _scoped_vmem_bytes(t, m, k, d, itembytes) <= _VMEM_CAP


def _topk_from_dist(dist, out_ref, dist_ref, k: int, m_valid: int,
                    val_ref=None):
    """Iterative masked argmin: k rounds over the (T, M) tile; smallest
    index wins ties (torch.topk order). Writes (T, k) int32 to out_ref[0]
    (and the selected distances to val_ref[0] when given — used by the
    ring-merge of the edge-partitioned path). The rounds run under
    ``fori_loop`` with the distance matrix masked in place in the dist_ref
    VMEM scratch and the selected indices accumulated into out_ref by a
    masked lane write — one shared buffer set, so scoped VMEM stays O(T*M)
    (a static unroll makes Mosaic keep every round's SSA copy live)."""
    t, m = dist.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    big = jnp.float32(jnp.inf)
    bigc = jnp.int32(1 << 30)
    dist_ref[...] = jnp.where(col < m_valid, dist, big)
    out_ref[0] = jnp.zeros((t, k), jnp.int32)
    if val_ref is not None:
        val_ref[0] = jnp.full((t, k), big)

    def round_body(j, _):
        d = dist_ref[...]
        # min + lexicographic column extraction (NOT jnp.argmin: Mosaic's
        # argmin lowering does not guarantee the first-occurrence tie order
        # lax.top_k uses — observed index flips on bitwise-equal distances)
        v_j = jnp.min(d, axis=1)                               # (T,)
        idx_j = jnp.min(jnp.where(d == v_j[:, None], col, bigc),
                        axis=1).astype(jnp.int32)
        out_ref[0] = jnp.where(lane_k == j, idx_j[:, None], out_ref[0])
        if val_ref is not None:
            val_ref[0] = jnp.where(lane_k == j, v_j[:, None], val_ref[0])

        @pl.when(j != k - 1)
        def _():
            dist_ref[...] = jnp.where(col == idx_j[:, None], big, d)

        return 0

    jax.lax.fori_loop(0, k, round_body, 0)


def _dist_tile(x, y):
    # bf16 operands: a single DEFAULT bf16 MXU pass is bitwise equal to the
    # fp32 HIGHEST 6-pass dot on bf16-valued data (the correction passes add
    # exact zeros) at 1/6 the MXU work. fp32 operands keep HIGHEST.
    precision = (jax.lax.Precision.DEFAULT
                 if x.dtype == jnp.bfloat16 and y.dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    inner = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (T, M)
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    x_sq = jnp.sum(x32 * x32, axis=1, keepdims=True)
    y_sq = jnp.sum(y32 * y32, axis=1, keepdims=True)
    return x_sq - 2.0 * inner + y_sq.T


def _knn_kernel_bias(x_ref, y_ref, bias_ref, out_ref, dist_ref, *, k, m_valid):
    dist = _dist_tile(x_ref[0], y_ref[0]) + bias_ref[...]
    _topk_from_dist(dist, out_ref, dist_ref, k, m_valid)


def _knn_kernel_nobias(x_ref, y_ref, out_ref, dist_ref, *, k, m_valid):
    dist = _dist_tile(x_ref[0], y_ref[0])
    _topk_from_dist(dist, out_ref, dist_ref, k, m_valid)


def _knn_kernel_bias_vals(x_ref, y_ref, bias_ref, out_ref, val_out_ref,
                          dist_ref, *, k, m_valid):
    dist = _dist_tile(x_ref[0], y_ref[0]) + bias_ref[...]
    _topk_from_dist(dist, out_ref, dist_ref, k, m_valid, val_ref=val_out_ref)


def _knn_kernel_nobias_vals(x_ref, y_ref, out_ref, val_out_ref, dist_ref, *,
                            k, m_valid):
    dist = _dist_tile(x_ref[0], y_ref[0])
    _topk_from_dist(dist, out_ref, dist_ref, k, m_valid, val_ref=val_out_ref)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret",
                                              "return_values"))
def knn_topk(
    x: Array,
    y: Array,
    *,
    k: int,
    bias: Array | None = None,
    tile_n: int = 256,
    interpret: bool = False,
    return_values: bool = False,
) -> Array:
    """k nearest targets per query by squared L2 distance (+bias).

    Args:
      x: (BG, N, D) queries (pre-normalized by the caller).
      y: (BG, M, D) targets.
      bias: optional (N, M) additive bias (broadcast over batch).
      k: neighbors (static).
      return_values: also return the selected distances (BG, N, k) fp32 —
        needed by the edge-partitioned ring merge.
    Returns:
      (BG, N, k) int32 indices into M (or (idx, dists) with return_values).
    """
    bg, n, d = x.shape
    m = y.shape[1]
    if not (x.dtype == jnp.bfloat16 and y.dtype == jnp.bfloat16):
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)

    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    tile_n = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    # bg innermost: the (tile, M) bias block index is then unchanged
    # across consecutive grid steps and Pallas skips its HBM re-fetch
    grid = (n_pad // tile_n, bg)
    x_spec = pl.BlockSpec((1, tile_n, d), lambda i, b: (b, i, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, m, d), lambda i, b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_n, k), lambda i, b: (b, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bg, n_pad, k), jnp.int32)
    cost = pl.CostEstimate(
        flops=2 * bg * n_pad * m * d + 3 * k * bg * n_pad * m,
        bytes_accessed=bg * (n_pad * d + m * d) * 4 + n_pad * m * 4,
        transcendentals=0,
    )
    itembytes = 2 if x.dtype == jnp.bfloat16 else 4
    params = pltpu.CompilerParams(vmem_limit_bytes=min(
        _VMEM_CAP,
        max(16 * 1024 * 1024,
            int(_scoped_vmem_bytes(tile_n, m, k, d, itembytes) * 1.25)
            + 2 * 1024 * 1024)))

    if return_values:
        out_specs = [out_spec,
                     pl.BlockSpec((1, tile_n, k), lambda i, b: (b, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [out_shape,
                      jax.ShapeDtypeStruct((bg, n_pad, k), jnp.float32)]
        kern_bias, kern_nobias = _knn_kernel_bias_vals, _knn_kernel_nobias_vals
    else:
        out_specs, out_shapes = out_spec, out_shape
        kern_bias, kern_nobias = _knn_kernel_bias, _knn_kernel_nobias

    if bias is not None:
        bias2 = bias.astype(jnp.float32)
        if n_pad != n:
            bias2 = jnp.pad(bias2, ((0, n_pad - n), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kern_bias, k=k, m_valid=m),
            grid=grid,
            in_specs=[x_spec, y_spec,
                      pl.BlockSpec((tile_n, m), lambda i, b: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_specs, out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((tile_n, m), jnp.float32)],
            interpret=interpret, cost_estimate=cost,
            compiler_params=params,
        )(x, y, bias2)
    else:
        out = pl.pallas_call(
            functools.partial(kern_nobias, k=k, m_valid=m),
            grid=grid,
            in_specs=[x_spec, y_spec],
            out_specs=out_specs, out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((tile_n, m), jnp.float32)],
            interpret=interpret, cost_estimate=cost,
            compiler_params=params,
        )(x, y)
    if return_values:
        idx, vals = out
        if n_pad != n:
            idx, vals = idx[:, :n], vals[:, :n]
        return idx, vals
    return out[:, :n] if n_pad != n else out
