"""Top-level image classifier: backbone + head (reference
classifiers/image.py + classifiers/base.py dispatch, functionalized).

The module computes logits; train/eval drivers call ``loss_fn`` /
``predict_fn`` below (the reference's forward_train/simple_test split).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gkgnet_tpu.nn.gkgnet import GKGNet
from gkgnet_tpu.nn.heads import LabelQueryHead

Array = jax.Array


class GKGNetClassifier(nn.Module):
    """GKGNet backbone + LabelQueryHead.

    ``__call__`` returns ``(cls_score (B, n_classes), edge_index)`` — the
    edge indices of the last label GCN are surfaced for visualization
    (reference keeps them in the backbone output tuple, gkgnet.py:279).
    """

    arch: str = "s"
    k: int = 9
    k_label_gcn: int = 9
    num_group: int = 2
    drop_path: float = 0.0
    n_classes: int = 80
    size: int = 576
    num_gcn: int = 1
    out_indices: tuple = (3,)
    graph_builder: str = "knn"   # 'knn' | 'perturbed' (differentiable top-k)
    dtype: Any = jnp.float32
    head_kwargs: dict | None = None
    # optional neck over the backbone's multi-scale stage features
    # (reference ImageClassifier.extract_feat: backbone -> neck -> head,
    # classifiers/image.py:144-169; with a neck the head is a linear
    # multi-label head over the fused/pooled neck output)
    neck_cfg: dict | None = None

    def setup(self):
        from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS
        from gkgnet_tpu.nn.heads import MultiLabelLinearClsHead
        from gkgnet_tpu.nn.necks import build_neck

        in_channels = ARCH_SETTINGS[self.arch]["channels"][-1]
        out_indices = tuple(self.neck_cfg.get("out_indices", self.out_indices)) \
            if self.neck_cfg else tuple(self.out_indices)
        self.backbone = GKGNet(
            arch=self.arch, k=self.k, k_label_gcn=self.k_label_gcn,
            num_group=self.num_group, drop_path=self.drop_path,
            n_classes=self.n_classes, size=self.size, num_gcn=self.num_gcn,
            out_indices=out_indices,
            return_stage_feats=self.neck_cfg is not None,
            graph_builder=self.graph_builder,
            dtype=self.dtype,
        )
        if self.neck_cfg is not None:
            self.neck = build_neck(self.neck_cfg, self.dtype)
            neck_channels = self.neck_cfg.get("out_channels", in_channels)
            self.head = MultiLabelLinearClsHead(
                num_classes=self.n_classes, in_channels=neck_channels,
                dtype=self.dtype, **(self.head_kwargs or {}))
        else:
            self.head = LabelQueryHead(
                num_classes=self.n_classes, in_channels=in_channels,
                dtype=self.dtype, **(self.head_kwargs or {}),
            )

    def __call__(self, imgs: Array, train: bool = False):
        if self.neck_cfg is not None:
            label_emb, gap, edge_index, feats = self.backbone(imgs, train)
            h = self.neck(feats)
            if isinstance(h, (tuple, list)):
                h = h[-1]
            if h.ndim == 4:
                h = jnp.mean(h, axis=(1, 2))
            elif h.ndim == 3:  # (B, n_classes, P) from MultiLabelProjection
                h = jnp.mean(h, axis=1)
            cls_score = self.head(h)
            return cls_score, edge_index
        label_emb, gap, edge_index = self.backbone(imgs, train)
        cls_score = self.head(label_emb, gap)
        return cls_score, edge_index

    @nn.nowrap
    def build_loss_head(self):
        """Unbound head instance whose ``.loss`` matches this classifier's
        configuration (heads carry no parameters in their losses).
        ``nn.nowrap``: this is a plain factory, not a module method — flax
        must not try to register the created head as a child module."""
        from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS
        from gkgnet_tpu.nn.heads import MultiLabelLinearClsHead

        in_channels = ARCH_SETTINGS[self.arch]["channels"][-1]
        if self.neck_cfg is not None:
            return MultiLabelLinearClsHead(
                num_classes=self.n_classes,
                in_channels=self.neck_cfg.get("out_channels", in_channels),
                **(self.head_kwargs or {}))
        return LabelQueryHead(num_classes=self.n_classes,
                              in_channels=in_channels,
                              **(self.head_kwargs or {}))

    def loss(self, cls_score: Array, gt_label: Array) -> dict:
        return self.head.loss(cls_score, gt_label)

    def predict(self, cls_score: Array) -> Array:
        return self.head.simple_test(cls_score)


def parse_losses(losses: dict) -> tuple[Array, dict]:
    """Total loss = sum of every value whose key contains 'loss'
    (classifiers/base.py:96-111)."""
    log_vars = {k: jnp.mean(v) for k, v in losses.items()}
    total = sum(v for k, v in log_vars.items() if "loss" in k)
    log_vars["loss"] = total
    return total, log_vars
