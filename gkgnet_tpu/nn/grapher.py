"""Grapher blocks: dynamic k-NN graph convolution over the patch grid and the
label->patch cross-graph (reference: torch_vertex.py).

Group folding: with ``num_group=g`` the channel dim is split into g groups
folded into the batch axis; each group builds its own k-NN edge set over its
C/g-dim features (torch_vertex.py:199-202). After max-relative aggregation
the groups are unfolded and the center/aggregate features are
channel-interleaved before the grouped 1x1 conv (torch_vertex.py:57-61) —
the order matters for torch-checkpoint parity.

All five aggregators of the reference dispatcher (torch_vertex.py:153-173)
are provided: 'mr' (the live one), 'edge', 'sage', 'gin', 'gat'. As in the
reference, only 'mr' composes with multi-group folding; the others require
``num_group=1`` (their conv shapes assume unfolded channels).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gkgnet_tpu.nn.layers import (
    Activation,
    BasicConv,
    ConvNorm,
    DropPath,
    FFN,
    PointwiseConv,
    avg_pool_nhwc,
)
from gkgnet_tpu.ops.aggregate import (
    gather_nodes,
    interleave_channels,
    max_relative,
)
from gkgnet_tpu.ops.knn import _pallas_enabled, dilate_edges, knn_graph


def _grouped_enabled() -> bool:
    # The fold-aware grouped kernels (GKGNET_GROUPED=1) are bitwise-exact
    # on hardware but measured a net LOSS at model level (eval 95.9 vs
    # 106.7 img/s, v5e): the static in-kernel group loop costs more than
    # the (B,N,C)<->(B*g,N,C/g) fold/unfold copies it eliminates
    # (stage1 +2.2 ms/invocation vs ~2.7 ms of copies per step TOTAL;
    # tools/exp_grouped_check.py, docs/PERF_BREAKDOWN_r05.md). Default
    # is therefore the explicit fold + folded-kernel path.
    import os

    return os.environ.get("GKGNET_GROUPED", "0") == "1"
from gkgnet_tpu.parallel.sharding import (
    active_graph_cfg,
    data_axis_size,
    graph_axis_size,
    shard_nodes,
)

Array = jax.Array
Dtype = Any


def fold_groups(x: Array, g: int) -> Array:
    """(B, N, C) -> (B*g, N, C/g); group i holds channels [i*C/g, (i+1)*C/g)."""
    if g == 1:
        return x
    b, n, c = x.shape
    return x.reshape(b, n, g, c // g).transpose(0, 2, 1, 3).reshape(b * g, n, c // g)


def unfold_groups(x: Array, g: int) -> Array:
    """(B*g, N, D) -> (B, N, g*D), inverse of fold_groups."""
    if g == 1:
        return x
    bg, n, d = x.shape
    return x.reshape(bg // g, g, n, d).transpose(0, 2, 1, 3).reshape(bg // g, n, g * d)


class GraphAggregate(nn.Module):
    """Aggregate neighbor features + 1x1 grouped-conv mixing.

    Operates on (possibly group-folded) node tensors ``x (BG, N, D)`` with
    neighbor indices ``idx (BG, N, k)`` into targets ``y (BG, M, D)``.
    Returns unfolded ``(B, N, out_channels)``.
    """

    conv: str = "mr"
    in_channels: int = 0       # full (unfolded) channel count
    out_channels: int = 0
    act: str = "relu"
    norm: str | None = "batch"
    use_bias: bool = True
    num_group: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, idx: Array, y: Array | None, train: bool,
                 precomputed: Array | None = None) -> Array:
        g = self.num_group
        if self.conv != "mr" and g != 1:
            raise ValueError(f"conv='{self.conv}' does not support multi-group folding")
        nn_channels = [self.in_channels * 2, self.out_channels]

        if self.conv == "mr":
            # fused Pallas path precomputes the aggregate alongside top-k
            agg = precomputed if precomputed is not None \
                else max_relative(x, idx, y)              # (BG, N, D) folded
            x_full = unfold_groups(x, g)                  # (B, N, C)
            agg_full = unfold_groups(agg, g)
            h = interleave_channels(x_full, agg_full)     # (B, N, 2C)
            return BasicConv(nn_channels, self.act, self.norm, self.use_bias,
                             dtype=self.dtype, name="nn")(h, train)

        src = x if y is None else y
        x_j = gather_nodes(src, idx)                      # (B, N, k, C)
        x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)

        if self.conv == "edge":
            h = jnp.concatenate([x_i, x_j - x_i], axis=-1)
            h = BasicConv(nn_channels, self.act, self.norm, self.use_bias,
                          dtype=self.dtype, name="nn")(h, train)
            return jnp.max(h, axis=2)

        if self.conv == "sage":
            h = BasicConv([self.in_channels, self.in_channels], self.act, self.norm,
                          self.use_bias, dtype=self.dtype, name="nn1")(x_j, train)
            h = jnp.max(h, axis=2)
            h = jnp.concatenate([x, h], axis=-1)
            return BasicConv(nn_channels, self.act, self.norm, self.use_bias,
                             dtype=self.dtype, name="nn2")(h, train)

        if self.conv == "gin":
            eps = self.param("eps", nn.initializers.zeros, (1,), jnp.float32)
            h = jnp.sum(x_j, axis=2)
            h = (1.0 + eps.astype(x.dtype)) * x + h
            return BasicConv([self.in_channels, self.out_channels], self.act, self.norm,
                             self.use_bias, dtype=self.dtype, name="nn")(h, train)

        if self.conv == "gat":
            e = PointwiseConv(1, use_bias=self.use_bias, dtype=self.dtype, name="a")(
                jnp.concatenate([x_i, x_j], axis=-1)
            )[..., 0]                                     # (B, N, k)
            atten = jax.nn.softmax(e.astype(jnp.float32), axis=-1).astype(x.dtype)
            agg = jnp.sum(atten[..., None] * x_j, axis=2)  # (B, N, C)
            h = interleave_channels(x, agg)
            return BasicConv(nn_channels, self.act, self.norm, self.use_bias,
                             dtype=self.dtype, name="nn")(h, train)

        raise NotImplementedError(f"conv:{self.conv} is not supported")


def _soft_maxrel(mod: nn.Module, xn: Array, y: Array | None, k: int,
                 dilation: int, train: bool) -> Array:
    """Differentiable graph build: perturbed-top-k soft neighbor gather +
    max-relative (torch_edge.py:107-122 semantics; sigma/num_samples are the
    reference's hard-coded 0.1/20). Only 'mr' aggregation composes with the
    soft gather (as in the reference, which feeds x_j straight to MRConv)."""
    if mod.conv != "mr":
        raise ValueError("graph_builder='perturbed' requires conv='mr'")
    from gkgnet_tpu.ops.perturbed_topk import soft_knn_gather

    rng = mod.make_rng("perturbed") if train else None
    x_j = soft_knn_gather(xn, y if y is not None else xn, k,
                          dilation=dilation, rng=rng, training=train)
    return jnp.max(x_j.astype(xn.dtype) - xn[:, :, None, :], axis=2)


class SpatialGraphConv(nn.Module):
    """Dynamic spatial graph conv over the patch grid
    (DyGraphConv2d[MultiGroup], torch_vertex.py:175-228).

    Builds a per-group k*d-NN graph of the (optionally r x r avg-pooled)
    target set, dilates to k, aggregates. Input/output NHWC.
    """

    in_channels: int
    out_channels: int
    k: int = 9
    dilation: int = 1
    conv: str = "mr"
    act: str = "relu"
    norm: str | None = "batch"
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    r: int = 1
    num_group: int = 2
    knn_chunk: int | None = None
    # 'knn' (hard top-k, the live path) or 'perturbed' (differentiable
    # soft top-k, DenseDilatedKnnGraphDifferentiable torch_edge.py:177-202)
    graph_builder: str = "knn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, rel_pos: Array | None, train: bool):
        b, h, w, c = x.shape
        g = self.num_group
        y = None
        y_nodes = None
        if self.r > 1:
            y_pool = avg_pool_nhwc(x, self.r)
            y_nodes = y_pool.reshape(b, -1, c)
            y = shard_nodes(fold_groups(y_nodes, g), "targets")
        x_nodes = x.reshape(b, -1, c)
        xn = shard_nodes(fold_groups(x_nodes, g), "queries")

        if self.graph_builder == "perturbed":
            maxrel = _soft_maxrel(self, xn, y, self.k, self.dilation, train)
            out = GraphAggregate(self.conv, self.in_channels,
                                 self.out_channels, self.act, self.norm,
                                 self.use_bias, g, dtype=self.dtype,
                                 name="gconv")(xn, None, y, train,
                                               precomputed=maxrel)
            return out.reshape(b, h, w, self.out_channels), None

        stochastic_now = self.stochastic and train and self.epsilon > 0.0
        maxrel = None
        m = y.shape[1] if y is not None else xn.shape[1]

        # Under an active graph axis route through the explicit
        # edge-partitioned shard_map path (ring-overlapped or all-gather)
        # so the fused Pallas kernels run per shard — GSPMD cannot
        # partition a custom call over the query axis.
        gcfg = active_graph_cfg()
        gs = graph_axis_size()
        if (gcfg is not None and gs > 1 and self.conv == "mr"
                and not stochastic_now
                and xn.shape[1] % gs == 0 and m % gs == 0
                and xn.shape[0] % data_axis_size() == 0):
            from gkgnet_tpu.parallel.edge_partition import (
                _pallas_ok, edge_partitioned_knn_mr)

            idx, maxrel = edge_partitioned_knn_mr(
                gcfg.mesh, xn, y, rel_pos, k=self.k, dilation=self.dilation,
                data_axis=gcfg.data_axis, graph_axis=gcfg.graph_axis,
                use_pallas=_pallas_ok(), overlap=gcfg.overlap)
            out = GraphAggregate(self.conv, self.in_channels,
                                 self.out_channels, self.act, self.norm,
                                 self.use_bias, g, dtype=self.dtype,
                                 name="gconv")(xn, idx, y, train,
                                               precomputed=maxrel)
            return out.reshape(b, h, w, self.out_channels), idx

        use_fused = (self.conv == "mr" and not stochastic_now
                     and _pallas_enabled())
        if use_fused:
            from gkgnet_tpu.ops.pallas.knn_mr import fused_fits, knn_mr_fused

            use_fused = fused_fits(
                xn.shape[1], m, self.k, self.dilation, d=xn.shape[2],
                itembytes=jnp.dtype(xn.dtype).itemsize)
        if use_fused and g > 1 and graph_axis_size() == 1 \
                and _grouped_enabled():
            # fold-aware fused path: x/y stay unfolded and the kernel
            # runs a static per-group loop over full-channel blocks
            # (Mosaic requires trailing block dims be 128-divisible OR
            # full — a per-group channel-sliced BlockSpec fails to
            # lower; hardware taught us that mid-round). The
            # (B, N, C) <-> (B*g, N, C/g) fold/unfold transposes
            # (~2.7 ms of layout copies per eval step at stage 1 alone,
            # r5 device trace) never materialize.
            from gkgnet_tpu.ops.pallas.knn_mr import knn_mr_fused_grouped

            idx_g, maxrel_unf = knn_mr_fused_grouped(
                x_nodes, y_nodes if y_nodes is not None else x_nodes,
                rel_pos, self.k, self.dilation, g)
            out = GraphAggregate(self.conv, self.in_channels,
                                 self.out_channels, self.act, self.norm,
                                 self.use_bias, 1, dtype=self.dtype,
                                 name="gconv")(x_nodes, None, y_nodes,
                                               train,
                                               precomputed=maxrel_unf)
            # folded (B*g, N, k) edge layout for API parity with the
            # other paths (DCE'd when the caller ignores edges)
            idx = idx_g.transpose(0, 2, 1, 3).reshape(
                b * g, x_nodes.shape[1], self.k)
            return out.reshape(b, h, w, self.out_channels), idx
        if use_fused:
            idx, maxrel = knn_mr_fused(xn, y if y is not None else xn,
                                       rel_pos, self.k, self.dilation)
        else:
            idx = knn_graph(xn, y, k=self.k * self.dilation, bias=rel_pos,
                            query_chunk=self.knn_chunk)
            idx = shard_nodes(idx, "edges")
            rng = self.make_rng("dilation") if stochastic_now else None
            idx = dilate_edges(idx, dilation=self.dilation,
                               stochastic=self.stochastic,
                               epsilon=self.epsilon, rng=rng, training=train)

        out = GraphAggregate(self.conv, self.in_channels, self.out_channels,
                             self.act, self.norm, self.use_bias, g,
                             dtype=self.dtype, name="gconv")(
            xn, idx, y, train, precomputed=maxrel)
        return out.reshape(b, h, w, self.out_channels), idx


class LabelGraphConv(nn.Module):
    """Label->patch cross-graph conv (DyGraphLabel[MultiGroup],
    torch_vertex.py:229-275): label tokens query the stage feature map."""

    in_channels: int
    out_channels: int
    k: int = 9
    dilation: int = 1
    conv: str = "mr"
    act: str = "relu"
    norm: str | None = "batch"
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    num_group: int = 2
    graph_builder: str = "knn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: Array, feats: Array, train: bool):
        g = self.num_group
        xn = fold_groups(labels, g)                       # (B*g, L, C/g)
        yn_local = fold_groups(feats, g)                  # (B*g, N, C/g)
        # replicate the targets along the graph axis for every path EXCEPT
        # the graph-sharded label build, which consumes them sharded
        # (replicating first would pay the all-gather it avoids)
        yn = shard_nodes(yn_local, "targets")
        if self.graph_builder == "perturbed":
            maxrel = _soft_maxrel(self, xn, yn, self.k, self.dilation, train)
            out = GraphAggregate(self.conv, self.in_channels,
                                 self.out_channels, self.act, self.norm,
                                 self.use_bias, g, dtype=self.dtype,
                                 name="gconv")(xn, None, yn, train,
                                               precomputed=maxrel)
            return out, None
        stochastic_now = self.stochastic and train and self.epsilon > 0.0
        maxrel = None

        # active graph axis: the label tokens are replicated over it while
        # only the data axis is sharded — run the fused kernel inside a
        # data-mapped shard_map (GSPMD can't partition the custom call)
        gcfg = active_graph_cfg()
        if (gcfg is not None and graph_axis_size() > 1 and self.conv == "mr"
                and not stochastic_now
                and xn.shape[0] % data_axis_size() == 0):
            from gkgnet_tpu.parallel.edge_partition import (
                _pallas_ok, label_sharded_knn_mr, replicated_knn_mr)

            if yn_local.shape[1] % graph_axis_size() == 0:
                # shard the TARGET axis over graph: local top-k*d per
                # shard + exact lex merge — kernel cost / graph size
                # (r3 replicated the whole label kernel along graph)
                idx, maxrel = label_sharded_knn_mr(
                    gcfg.mesh, xn, yn_local, k=self.k,
                    dilation=self.dilation,
                    data_axis=gcfg.data_axis, graph_axis=gcfg.graph_axis,
                    use_pallas=_pallas_ok())
            else:
                idx, maxrel = replicated_knn_mr(
                    gcfg.mesh, xn, yn, k=self.k, dilation=self.dilation,
                    data_axis=gcfg.data_axis, graph_axis=gcfg.graph_axis,
                    use_pallas=_pallas_ok())
            out = GraphAggregate(self.conv, self.in_channels,
                                 self.out_channels, self.act, self.norm,
                                 self.use_bias, g, dtype=self.dtype,
                                 name="gconv")(xn, idx, yn, train,
                                               precomputed=maxrel)
            return out, idx

        use_fused = (self.conv == "mr" and not stochastic_now
                     and _pallas_enabled())
        if use_fused:
            from gkgnet_tpu.ops.pallas.knn_mr import fused_fits, knn_mr_fused

            use_fused = fused_fits(
                xn.shape[1], yn.shape[1], self.k, self.dilation,
                d=xn.shape[2], itembytes=jnp.dtype(xn.dtype).itemsize)
        if use_fused and g > 1 and graph_axis_size() == 1 \
                and _grouped_enabled():
            # fold-aware fused path (see SpatialGraphConv): the big win
            # here is the FEATURE fold — (B, N, C) -> (B*g, N, C/g) of a
            # full 20736-node stage-1 map — never materializing.
            from gkgnet_tpu.ops.pallas.knn_mr import knn_mr_fused_grouped

            idx_g, maxrel_unf = knn_mr_fused_grouped(
                labels, feats, None, self.k, self.dilation, g)
            out = GraphAggregate(self.conv, self.in_channels,
                                 self.out_channels, self.act, self.norm,
                                 self.use_bias, 1, dtype=self.dtype,
                                 name="gconv")(labels, None, feats, train,
                                               precomputed=maxrel_unf)
            idx = idx_g.transpose(0, 2, 1, 3).reshape(
                labels.shape[0] * g, labels.shape[1], self.k)
            return out, idx
        if use_fused:
            idx, maxrel = knn_mr_fused(xn, yn, None, self.k, self.dilation)
        else:
            idx = knn_graph(xn, yn, k=self.k * self.dilation)
            rng = self.make_rng("dilation") if stochastic_now else None
            idx = dilate_edges(idx, dilation=self.dilation,
                               stochastic=self.stochastic,
                               epsilon=self.epsilon, rng=rng, training=train)
        out = GraphAggregate(self.conv, self.in_channels, self.out_channels,
                             self.act, self.norm, self.use_bias, g,
                             dtype=self.dtype, name="gconv")(
            xn, idx, yn, train, precomputed=maxrel)
        return out, idx


class Grapher(nn.Module):
    """fc1 -> spatial graph conv -> fc2 with DropPath residual
    (torch_vertex.py:278-333). The static relative-position distance bias is
    passed in (shared per stage, see GKGNet)."""

    in_channels: int
    k: int = 9
    dilation: int = 1
    conv: str = "mr"
    act: str = "relu"
    norm: str | None = "batch"
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    r: int = 1
    drop_path: float = 0.0
    use_multi_group: bool = True
    num_group: int = 2
    knn_chunk: int | None = None
    graph_builder: str = "knn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, rel_pos: Array | None, train: bool) -> Array:
        shortcut = x
        x = ConvNorm(self.in_channels, dtype=self.dtype, name="fc1")(x, train)
        x, _ = SpatialGraphConv(
            self.in_channels, self.in_channels * 2, self.k, self.dilation,
            self.conv, self.act, self.norm, self.use_bias, self.stochastic,
            self.epsilon, self.r,
            num_group=self.num_group if self.use_multi_group else 1,
            knn_chunk=self.knn_chunk, graph_builder=self.graph_builder,
            dtype=self.dtype, name="graph_conv",
        )(x, rel_pos, train)
        x = ConvNorm(self.in_channels, dtype=self.dtype, name="fc2")(x, train)
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic=not train)
        return x + shortcut


class GrapherLabel(nn.Module):
    """Label-token grapher: fc1 -> cross-graph conv -> fc2 -> DropPath
    residual -> 4x FFN (torch_vertex.py:361-403). Returns the updated label
    embeddings and the (group-folded) label->patch edge indices for
    visualization (torch_vertex.py:275)."""

    in_channels: int
    k: int = 9
    dilation: int = 1
    conv: str = "mr"
    act: str = "relu"
    norm: str | None = "batch"
    use_bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    drop_path: float = 0.0
    use_multi_group: bool = True
    num_group: int = 2
    graph_builder: str = "knn"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: Array, feats: Array, train: bool):
        b, h, w, c = feats.shape
        feats = feats.reshape(b, h * w, c)
        shortcut = labels
        x = ConvNorm(self.in_channels, dtype=self.dtype, name="fc1")(labels, train)
        x, edge_idx = LabelGraphConv(
            self.in_channels, self.in_channels * 2, self.k, self.dilation,
            self.conv, self.act, self.norm, self.use_bias, self.stochastic,
            self.epsilon,
            num_group=self.num_group if self.use_multi_group else 1,
            graph_builder=self.graph_builder,
            dtype=self.dtype, name="graph_conv",
        )(x, feats, train)
        x = ConvNorm(self.in_channels, dtype=self.dtype, name="fc2")(x, train)
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic=not train)
        x = x + shortcut
        x = FFN(self.in_channels * 4, self.in_channels, self.act, self.drop_path,
                dtype=self.dtype, name="ffn")(x, train)
        return x, edge_idx
