"""GKGNet backbone (reference: mmcls/models/backbones/gkgnet.py).

A 4-stage pyramid of Grapher+FFN blocks over a stride-4 patch grid, with a
parallel label-embedding pathway: after the last block of every stage the
label tokens query the stage feature map through a cross-graph k-NN
(GrapherLabel), and are projected to the next stage's width (gkgnet.py:186-242,
263-284).

TPU-first notes:
  * NHWC throughout; node ops channel-last.
  * The per-stage relative-position distance bias is computed once on the
    host (fused form, see ops/pos_embed.py) and stored in a ``constants``
    variable collection — one table per stage, shared by all blocks of the
    stage (the reference duplicates an identical buffer per block).
  * No ``.cuda()``-style device coupling: label ids are a traced iota.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gkgnet_tpu.nn.grapher import Grapher, GrapherLabel
from gkgnet_tpu.nn.layers import Downsample, FFN, Stem
from gkgnet_tpu.ops.pos_embed import get_relative_pos_table

Array = jax.Array
Dtype = Any

ARCH_SETTINGS = {
    # gkgnet.py:122-149
    "t": dict(conv="mr", act="gelu", norm="batch", bias=True,
              epsilon=0.2, use_stochastic=False,
              blocks=(2, 2, 6, 2), channels=(48, 96, 240, 384), emb_dims=1024),
    "s": dict(conv="mr", act="gelu", norm="batch", bias=True,
              epsilon=0.2, use_stochastic=False,
              blocks=(2, 2, 6, 2), channels=(80, 160, 400, 640), emb_dims=1024),
    # 'b' extends the registry with the upstream pyramid-ViG base geometry
    # (pvig_b, Vision GNN arXiv:2206.00272) — not in the reference's t/s
    # table, required by the pvig_b stress config in BASELINE.json.
    "b": dict(conv="mr", act="gelu", norm="batch", bias=True,
              epsilon=0.2, use_stochastic=False,
              blocks=(2, 2, 18, 2), channels=(128, 256, 512, 1024),
              emb_dims=1024),
}

REDUCE_RATIOS = (4, 2, 1, 1)  # gkgnet.py:180


def _divisor_chunk(n: int, m: int, budget_elems: int = 1 << 22) -> int | None:
    """Largest divisor ``c`` of n with c*m <= budget, or None if no tiling
    needed. Bounds the live distance-matrix block (the reference's
    n_part=10000 chunking, torch_edge.py:65-78, made static-shape)."""
    if n * m <= budget_elems:
        return None
    best = 1
    for c in range(1, n + 1):
        if n % c == 0 and c * m <= budget_elems and c > best:
            best = c
    return best if best < n else None


class GKGNet(nn.Module):
    """Multi-label Vision-GNN backbone. Returns
    ``(label_embeddings (B, n_classes, C3), gap_features (B, C3), edge_index)``.
    """

    arch: str = "s"
    k: int = 9
    k_label_gcn: int = 9
    use_multi_group: bool = True          # label pathway grouping
    backbone_multi_group: bool = True     # spatial pathway grouping
    num_group: int = 2
    drop_path: float = 0.0
    n_classes: int = 80
    size: int = 576
    num_gcn: int = 1                      # GrapherLabels in the last stage
    out_indices: tuple = (3,)
    return_stage_feats: bool = False      # also return multi-scale features
    graph_builder: str = "knn"            # 'knn' | 'perturbed' (soft top-k)
    knn_budget: int = 1 << 22
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        opt = ARCH_SETTINGS[self.arch]
        blocks, channels = opt["blocks"], opt["channels"]
        n_blocks = sum(blocks)
        act, conv, bias = opt["act"], opt["conv"], opt["bias"]
        stochastic, epsilon = opt["use_stochastic"], opt["epsilon"]
        dpr = np.linspace(0, self.drop_path, n_blocks)
        max_dilation = 49 // self.k
        layer_index = [int(np.sum(blocks[: i + 1])) + i - 1 for i in range(len(blocks))]

        b = x.shape[0]
        label_emb = nn.Embed(
            self.n_classes, channels[0],
            embedding_init=nn.initializers.normal(1.0),
            param_dtype=jnp.float32, name="label_lt",
        )(jnp.broadcast_to(jnp.arange(self.n_classes)[None], (b, self.n_classes)))
        label_emb = label_emb.astype(self.dtype)

        x = Stem(channels[0], act, dtype=self.dtype, name="stem")(x, train)
        hw = self.size // 4
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, hw, hw, channels[0]), jnp.float32
        )
        x = x + pos_embed.astype(self.dtype)

        # Per-stage static relative-position distance bias (shared by blocks).
        n0 = hw * hw
        rel_tables = []
        n_stage = n0
        for i in range(len(blocks)):
            c_i, r_i, n_i = channels[i], REDUCE_RATIOS[i], n_stage
            table = self.variable(
                "constants", f"rel_pos_stage{i}",
                lambda c=c_i, n=n_i, r=r_i: jnp.asarray(get_relative_pos_table(c, n, r)),
            )
            rel_tables.append(table.value)
            n_stage //= 4

        module_idx = 0   # position in the flat backbone list (15 entries)
        grapher_idx = 0  # position among the 12 Grapher blocks
        stage_n = n0
        edge_index = None
        label_stage = 0
        stage_feats = []  # end-of-stage maps for out_indices / necks
        for i in range(len(blocks)):
            if i > 0:
                x = Downsample(channels[i], dtype=self.dtype,
                               name=f"backbone_{module_idx}")(x, train)
                module_idx += 1
                stage_n //= 4
            r_i = REDUCE_RATIOS[i]
            chunk = _divisor_chunk(stage_n, stage_n // (r_i * r_i), self.knn_budget)
            for _ in range(blocks[i]):
                dilation = min(grapher_idx // 4 + 1, max_dilation)
                n_targets = stage_n // (r_i * r_i)
                if self.k * dilation > n_targets:
                    raise ValueError(
                        f"stage {i}: k*dilation={self.k * dilation} exceeds "
                        f"{n_targets} candidate nodes — increase `size` or "
                        f"reduce `k` (k=9 needs size>=224)")
                x = Grapher(
                    channels[i], self.k, dilation, conv, act, "batch", bias,
                    stochastic, epsilon, r_i, drop_path=float(dpr[grapher_idx]),
                    use_multi_group=self.backbone_multi_group,
                    num_group=self.num_group, knn_chunk=chunk,
                    graph_builder=self.graph_builder,
                    dtype=self.dtype, name=f"backbone_{module_idx}_grapher",
                )(x, rel_tables[i], train)
                x = FFN(channels[i] * 4, channels[i], act,
                        drop_path=float(dpr[grapher_idx]), dtype=self.dtype,
                        name=f"backbone_{module_idx}_ffn")(x, train)
                module_idx += 1
                grapher_idx += 1
                if module_idx - 1 in layer_index:
                    # label pathway taps the end of every stage (gkgnet.py:272-277)
                    n_label_gcn = self.num_gcn if i == len(blocks) - 1 else 1
                    for kk in range(n_label_gcn):
                        label_emb, edge_index = GrapherLabel(
                            channels[i], self.k_label_gcn, 1, "mr", act, "batch",
                            bias, stochastic, epsilon,
                            drop_path=float(dpr[int(np.sum(blocks[:i]))]),
                            use_multi_group=self.use_multi_group,
                            num_group=self.num_group,
                            graph_builder=self.graph_builder,
                            dtype=self.dtype,
                            name=f"gcn_label_{label_stage}_{kk}",
                        )(label_emb, x, train)
                    if label_stage < len(blocks) - 1:
                        label_emb = nn.Dense(
                            channels[i + 1], dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"ffn_label_{label_stage}",
                        )(label_emb)
                    label_stage += 1
            if i in self.out_indices:
                stage_feats.append(x)

        gap = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, C3)
        if self.return_stage_feats:
            # multi-scale feature output selected by out_indices
            # (the reference accepts the knob but never honors it,
            # gkgnet.py:150-164; here it feeds the necks)
            return label_emb, gap.astype(self.dtype), edge_index, \
                tuple(stage_feats)
        return label_emb, gap.astype(self.dtype), edge_index
