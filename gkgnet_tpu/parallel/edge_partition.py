"""Explicit edge-partitioned distributed kNN + max-relative (shard_map).

The GSPMD path (parallel/sharding.py) lets XLA place the collectives; this
module is the hand-scheduled version for when the partitioning must be
exact: query nodes are sharded over the mesh's ``graph`` axis and each
shard selects against the *full* candidate set, so returned neighbor
indices are global and no lossy approximation is involved.

Two schedules:

  * ``overlap=False`` — one ``all_gather`` of the (small, pooled) target
    set over ICI, then local fused top-k + aggregate. Simple; the gather
    must finish before any selection starts.
  * ``overlap=True`` — the SURVEY north-star schedule (§2.8/§5.7): the
    target shards travel around a ``ppermute`` ring; each step runs the
    distance + local-top-k of the shard in hand while the next shard is in
    flight (XLA's async collective-permute overlaps the ICI transfer with
    the MXU/VPU work), and a running global top-k is maintained by an
    exact two-list merge keyed on (distance, global index) — the
    lexicographic sort reproduces torch.topk's lowest-index-wins tie
    order, so the result is bitwise identical to the all-gather path.

Inside the per-shard body the data axis is also mapped, so this composes
with DP; the fused Pallas kernels run per-shard when on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gkgnet_tpu.ops.aggregate import max_relative
from gkgnet_tpu.ops.knn import dilate_edges, knn_graph, l2_normalize, \
    pairwise_sqdist

Array = jax.Array


def _pallas_ok() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _local_topk_vals(xn: Array, yn: Array, bias: Array | None, kd: int,
                     use_pallas: bool):
    """(idx, dist) of the kd nearest targets; first-occurrence tie order.
    ``use_pallas`` is honored as given (off-TPU the kernels self-select
    interpret mode, which tests use for tiny shapes)."""
    kd = min(kd, yn.shape[1])
    if use_pallas:
        from gkgnet_tpu.ops.pallas.knn_topk import knn_topk, topk_fits

        if topk_fits(xn.shape[1], yn.shape[1], kd, d=xn.shape[2],
                     itembytes=jnp.dtype(xn.dtype).itemsize):
            return knn_topk(xn, yn, k=kd, bias=bias, return_values=True)
    dist = pairwise_sqdist(xn, yn)
    if bias is not None:
        dist = dist + bias[None]
    negv, idx = jax.lax.top_k(-dist, kd)
    return idx.astype(jnp.int32), -negv


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
    overlap: bool = False,
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
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_size = axis_sizes.get(graph_axis, 1)

    def gather_fn(x_l: Array, y_l: Array, bias_l: Array | None):
        # gather the full candidate set over the graph axis (ICI);
        # tiled=True concatenates shards in axis order -> global index space
        y_full = jax.lax.all_gather(y_l, graph_axis, axis=1, tiled=True)
        use_fused = use_pallas
        if use_fused:
            from gkgnet_tpu.ops.pallas.knn_mr import fused_fits, knn_mr_fused

            use_fused = fused_fits(
                x_l.shape[1], y_full.shape[1], k, dilation, d=x_l.shape[2],
                itembytes=jnp.dtype(x_l.dtype).itemsize)
        if use_fused:
            idx, mr = knn_mr_fused(x_l, y_full, bias_l, k, dilation)
        else:
            idx = knn_graph(x_l, y_full, k=k * dilation, bias=bias_l)
            idx = dilate_edges(idx, dilation=dilation)
            mr = max_relative(x_l, idx, y_full)
        return idx, mr

    def ring_fn(x_l: Array, y_l: Array, bias_l: Array | None):
        me = jax.lax.axis_index(graph_axis)
        bg, n_l, c = x_l.shape
        m_l = y_l.shape[1]
        kd = k * dilation
        xn = l2_normalize(jax.lax.stop_gradient(x_l))
        y_full = jnp.zeros((bg, m_l * s_size, c), y_l.dtype)
        run_vals = jnp.full((bg, n_l, kd), jnp.inf, jnp.float32)
        run_idx = jnp.zeros((bg, n_l, kd), jnp.int32)
        perm = [(i, (i + 1) % s_size) for i in range(s_size)]
        buf = y_l
        for s in range(s_size):
            shard_id = (me - s) % s_size
            offset = shard_id * m_l
            # launch the next transfer BEFORE computing on the shard in
            # hand — XLA's async collective-permute rides ICI while the
            # distance matmul + top-k run
            nxt = (jax.lax.ppermute(buf, graph_axis, perm)
                   if s + 1 < s_size else None)
            y_full = jax.lax.dynamic_update_slice(y_full, buf, (0, offset, 0))
            yn = l2_normalize(jax.lax.stop_gradient(buf))
            bias_c = None
            if bias_l is not None:
                bias_c = jax.lax.dynamic_slice(
                    bias_l, (0, offset), (n_l, m_l))
            cidx, cval = _local_topk_vals(xn, yn, bias_c, kd, use_pallas)
            cidx = cidx + offset
            # exact two-list merge: lexicographic (distance, global index)
            # — ties resolve to the lower global index, the torch.topk /
            # lax.top_k first-occurrence order of the unsharded build
            all_v = jnp.concatenate([run_vals, cval.astype(jnp.float32)], -1)
            all_i = jnp.concatenate([run_idx, cidx], -1)
            all_v, all_i = jax.lax.sort((all_v, all_i), dimension=-1,
                                        num_keys=2)
            run_vals, run_idx = all_v[..., :kd], all_i[..., :kd]
            if nxt is not None:
                buf = nxt
        idx = dilate_edges(run_idx, dilation=dilation)
        mr = max_relative(x_l, idx, y_full)
        return idx, mr

    local_fn = ring_fn if (overlap and s_size > 1) else gather_fn
    node_spec = P(data_axis, graph_axis, None)
    out_specs = (node_spec, node_spec)
    y_in = x if self_knn else y

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata, so the rep checker cannot validate bodies that invoke the
    # fused kernels
    if bias is not None:
        fn = shard_map(local_fn, mesh=mesh,
                       in_specs=(node_spec, node_spec, P(graph_axis, None)),
                       out_specs=out_specs, check_vma=False)
        return fn(x, y_in, bias)
    fn = shard_map(lambda xl, yl: local_fn(xl, yl, None), mesh=mesh,
                   in_specs=(node_spec, node_spec), out_specs=out_specs,
                   check_vma=False)
    return fn(x, y_in)


def label_sharded_knn_mr(
    mesh: Mesh,
    x: Array,
    y: Array,
    *,
    k: int,
    dilation: int = 1,
    data_axis: str = "data",
    graph_axis: str = "graph",
    use_pallas: bool = False,
):
    """Label-pathway kNN + max-relative with the TARGET axis sharded over
    ``graph`` (VERDICT r3 weak #4: ``replicated_knn_mr`` replicated the
    whole label kernel along the graph axis — at 768^2/k16 the stage-1
    label kernel is 3.5-5 ms x BG, not tiny).

    The queries (the n_classes label tokens) stay replicated — they are
    tiny — while each shard selects the local top-k*d against its M/G
    slice of the stage feature map, then the per-shard sorted candidate
    lists (B, L, k*d) are all-gathered (a few KB) and merged by the same
    exact (distance, global index) lexicographic sort the ring schedule
    uses, reproducing torch.topk's lowest-index-wins tie order bitwise
    (torch_edge.py:89-106). Winner features are fetched owner-side
    (ownership is disjoint by construction) and combined with a psum, so
    the max-relative runs replicated on every shard and gradients flow
    through gather + psum — no pmax differentiation.

    Args:
      x: (BG, L, C) label queries — sharded (data, None, None).
      y: (BG, M, C) stage feature map — sharded (data, graph, None).
    Returns:
      (idx (BG, L, k) int32 GLOBAL target indices, maxrel (BG, L, C)),
      both sharded (data, None, None) — bitwise equal to the
      replicated/unsharded build.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    s_size = axis_sizes.get(graph_axis, 1)
    kd = k * dilation

    def local_fn(x_l: Array, y_l: Array):
        me = jax.lax.axis_index(graph_axis)
        m_l = y_l.shape[1]
        offset = me * m_l
        xn = l2_normalize(jax.lax.stop_gradient(x_l))
        yn = l2_normalize(jax.lax.stop_gradient(y_l))
        kd_l = min(kd, m_l)
        cidx, cval = _local_topk_vals(xn, yn, None, kd_l, use_pallas)
        cval = cval.astype(jnp.float32)
        cidx = cidx + offset
        if kd_l < kd:  # more shards than candidates: pad to sort last
            pad = ((0, 0), (0, 0), (0, kd - kd_l))
            cval = jnp.pad(cval, pad, constant_values=jnp.inf)
            cidx = jnp.pad(cidx, pad, constant_values=jnp.int32(1 << 30))
        # merge: gather every shard's sorted list (tiny: L*kd ints) and
        # lex-sort on (distance, global index)
        av = jax.lax.all_gather(cval, graph_axis, axis=2, tiled=True)
        ai = jax.lax.all_gather(cidx, graph_axis, axis=2, tiled=True)
        av, ai = jax.lax.sort((av, ai), dimension=-1, num_keys=2)
        win_i = ai[..., :kd]
        idx = dilate_edges(win_i, dilation=dilation)
        # owner-side winner-feature fetch + psum combine
        local = (idx >= offset) & (idx < offset + m_l)
        lidx = jnp.clip(idx - offset, 0, m_l - 1)
        from gkgnet_tpu.ops.aggregate import gather_nodes

        x_j = gather_nodes(y_l, lidx)                   # (BG, L, k, C)
        x_j = jnp.where(local[..., None], x_j, 0)
        x_j = jax.lax.psum(x_j, graph_axis)
        mr = jnp.max(x_j - x_l[:, :, None, :], axis=2)
        return idx, mr

    rep = P(data_axis, None, None)
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(rep, P(data_axis, graph_axis, None)),
                   out_specs=(rep, rep), check_vma=False)
    return fn(x, y)


def replicated_knn_mr(
    mesh: Mesh,
    x: Array,
    y: Array,
    *,
    k: int,
    dilation: int = 1,
    data_axis: str = "data",
    graph_axis: str = "graph",
    use_pallas: bool = True,
):
    """Label-pathway variant under an active graph axis: queries (the 80
    label tokens) and the target feature map are both replicated along
    ``graph`` (the caller's 'targets' constraint already all-gathered the
    map); wrapping in shard_map lets the fused Pallas kernel run per data
    shard (GSPMD cannot partition a custom call, so without this the label
    path would drop to the XLA sort whenever a graph axis is active, even
    though only the data axis is actually sharded here). Compute is
    replicated along ``graph`` — the label path is tiny (80 queries).
    """
    del graph_axis

    def local_fn(x_l: Array, y_l: Array):
        from gkgnet_tpu.ops.pallas.knn_mr import fused_fits, knn_mr_fused

        if use_pallas and fused_fits(
                x_l.shape[1], y_l.shape[1], k, dilation, d=x_l.shape[2],
                itembytes=jnp.dtype(x_l.dtype).itemsize):
            return knn_mr_fused(x_l, y_l, None, k, dilation)
        idx = knn_graph(x_l, y_l, k=k * dilation)
        idx = dilate_edges(idx, dilation=dilation)
        return idx, max_relative(x_l, idx, y_l)

    spec = P(data_axis, None, None)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec),
                   out_specs=(spec, spec), check_vma=False)
    return fn(x, y)
