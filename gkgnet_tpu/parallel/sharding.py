"""Edge/node-partitioned graph parallelism via GSPMD sharding constraints.

The reference scales node count N only with single-device memory tricks
(chunking/pooling/dilation, SURVEY §5.7). Here N becomes a *distributed*
dimension: inside every dynamic graph conv the query-node axis is
constrained to the mesh's ``graph`` axis, while the (pooled, small) target
set stays replicated along it. XLA then partitions the
distance matmul + top-k + gather over query shards and inserts a single
all-gather of the target features over ICI — the two-phase top-k merge is
unnecessary because every query's full candidate set is local after the
(cheap) target gather.

Activated with:

    with graph_sharding(mesh):
        train_step(...)   # traced under this context

Outside the context the hooks are no-ops, so single-chip code pays nothing.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import NamedTuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: ContextVar = ContextVar("graph_sharding_cfg", default=None)


class GraphShardingCfg(NamedTuple):
    mesh: Mesh
    data_axis: str
    graph_axis: str
    # Schedule for the edge-partitioned kNN: one ``all_gather`` of the
    # target shard (False, DEFAULT) vs a ppermute ring that overlaps the
    # ICI transfer with local selection (True).
    #
    # Why all_gather is the default — analytic ICI-bytes vs compute model
    # (v5e: ~45 GB/s/link ICI, measured kernel costs docs/PERF_BREAKDOWN_r04.md):
    # both schedules move the same (s-1)/s * M*D bytes per device; the ring
    # merely splits the transfer into s-1 sequential steps so it can hide
    # under per-step selection. Overlap therefore only pays when
    # t_gather = M*D*2B / BW_ici is a noticeable fraction of the selection
    # kernel. At GKGNet shapes the target set is pooled and tiny:
    # stage1 M=1296, D=40 -> 104 KB bf16 -> ~2 us over ICI, vs a ~15 ms
    # selection kernel (0.01%). The ring's price — s-1 separate kernel
    # launches, an exact (distance, index) running merge, and lockstep
    # ppermute latency — dwarfs the transfer it hides, and every
    # measurement taken agrees (SCALING_r04.json: ring at 0.32-0.70x of
    # all_gather for s>1). Ring would only win at M*D*2B / BW_ici ≳
    # 0.1 * t_select, i.e. targets hundreds of MB large — not this model.
    overlap: bool = False


@contextmanager
def graph_sharding(mesh: Mesh, data_axis: str = "data",
                   graph_axis: str = "graph", overlap: bool = False):
    token = _ACTIVE.set(GraphShardingCfg(mesh, data_axis, graph_axis, overlap))
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def active_graph_cfg() -> GraphShardingCfg | None:
    return _ACTIVE.get()


def graph_axis_size() -> int:
    cfg = _ACTIVE.get()
    if cfg is None:
        return 1
    sizes = dict(zip(cfg.mesh.axis_names, cfg.mesh.devices.shape))
    return sizes.get(cfg.graph_axis, 1)


def data_axis_size() -> int:
    cfg = _ACTIVE.get()
    if cfg is None:
        return 1
    sizes = dict(zip(cfg.mesh.axis_names, cfg.mesh.devices.shape))
    return sizes.get(cfg.data_axis, 1)


def _constraint(mesh, spec):
    return NamedSharding(mesh, spec)


def shard_nodes(x, kind: str):
    """Constrain a tensor of the graph conv dataflow.

    kind:
      'queries'  — (BG, N, C): batch over data, nodes over graph
      'targets'  — (BG, M, C): batch over data, replicated over graph
      'edges'    — (BG, N, k): batch over data, queries over graph
      'grid'     — (B, H, W, C): batch over data, rows over graph
    """
    cfg = _ACTIVE.get()
    if cfg is None or x is None:
        return x
    mesh, data_axis, graph_axis = cfg.mesh, cfg.data_axis, cfg.graph_axis
    if kind == "queries" or kind == "edges":
        spec = P(data_axis, graph_axis, None)
    elif kind == "targets":
        spec = P(data_axis, None, None)
    elif kind == "grid":
        spec = P(data_axis, graph_axis, None, None)
    else:
        raise ValueError(kind)
    # only constrain if the sharded dims divide evenly; otherwise leave to XLA
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for dim, name in enumerate(spec):
        if name is not None and x.shape[dim] % axis_sizes[name] != 0:
            return x
    return jax.lax.with_sharding_constraint(x, _constraint(mesh, spec))
