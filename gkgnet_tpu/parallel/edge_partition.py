"""Explicit edge-partitioned distributed kNN + max-relative (shard_map).

The GSPMD path (parallel/sharding.py) lets XLA place the collectives; this
module is the hand-scheduled version for when the partitioning must be
exact: query nodes are sharded over the mesh's ``graph`` axis, each shard
``all_gather``s the (small, pooled) target set over ICI, builds its local
top-k against the *full* candidate set, and aggregates locally. Returned
neighbor indices are global (the all-gather preserves target order), so no
k-way top-k merge is needed — the merge-free design the SURVEY north star
asks for (§5.7, §2.8).

Inside the per-shard body the data axis is also mapped, so this composes
with DP; the fused Pallas kernel runs per-shard when on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gkgnet_tpu.ops.aggregate import max_relative
from gkgnet_tpu.ops.knn import dilate_edges, knn_graph

Array = jax.Array


def edge_partitioned_knn_mr(
    mesh: Mesh,
    x: Array,
    y: Array | None,
    bias: Array | None,
    *,
    k: int,
    dilation: int = 1,
    data_axis: str = "data",
    graph_axis: str = "graph",
    use_pallas: bool = False,
):
    """Distributed kNN build + max-relative aggregate.

    Args:
      x: (BG, N, C) query/center nodes — sharded (data, graph, None).
      y: (BG, M, C) target nodes sharded like x over their own M axis, or
         None for self-kNN (targets = x).
      bias: optional (N, M) distance bias — sharded (graph, None).
    Returns:
      (idx (BG, N, k) int32 with *global* target indices, maxrel (BG, N, C)),
      both sharded (data, graph, None).
    """
    self_knn = y is None

    def local_fn(x_l: Array, y_l: Array, bias_l: Array | None):
        # gather the full candidate set over the graph axis (ICI);
        # tiled=True concatenates shards in axis order -> global index space
        y_full = jax.lax.all_gather(y_l, graph_axis, axis=1, tiled=True)
        if use_pallas:
            from gkgnet_tpu.ops.pallas.knn_mr import knn_mr_fused

            idx, mr = knn_mr_fused(x_l, y_full, bias_l, k, dilation)
        else:
            idx = knn_graph(x_l, y_full, k=k * dilation, bias=bias_l)
            idx = dilate_edges(idx, dilation=dilation)
            mr = max_relative(x_l, idx, y_full)
        return idx, mr

    node_spec = P(data_axis, graph_axis, None)
    out_specs = (node_spec, node_spec)
    y_in = x if self_knn else y

    if bias is not None:
        fn = shard_map(local_fn, mesh=mesh,
                       in_specs=(node_spec, node_spec, P(graph_axis, None)),
                       out_specs=out_specs)
        return fn(x, y_in, bias)
    fn = shard_map(lambda xl, yl: local_fn(xl, yl, None), mesh=mesh,
                   in_specs=(node_spec, node_spec), out_specs=out_specs)
    return fn(x, y_in)
