"""Classification heads.

``LabelQueryHead`` (reference heads/label_query_head.py): per-class score =
diagonal of fc1(label_embeddings) + fc2(gap_features). The diagonal-of-matmul
is computed directly as a per-class dot product (no (B, 80, 80) intermediate,
no eye-mask — same math as label_query_head.py:49-57).

Train loss is the dual loss: label-smoothed sigmoid BCE (avg over batch) +
10x asymmetric loss (label_query_head.py:70-85 with
configs/gkgnet/gkgnet_coco_576.py:32-37).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gkgnet_tpu.nn import losses as L

Array = jax.Array
Dtype = Any

normal_init = nn.initializers.normal(stddev=0.01)


class LabelQueryHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 640
    softmax: bool = False
    double_loss: bool = True
    # ASL config (cfg:32-36)
    gamma_pos: float = 0.0
    gamma_neg: float = 2.0
    clip: float = 0.05
    asy_loss_scale: float = 10.0
    label_smooth_val: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, label_emb: Array, gap: Array) -> Array:
        """label_emb (B, num_classes, C), gap (B, C) -> logits (B, num_classes)."""
        w1 = self.param("fc1_kernel", normal_init,
                        (self.num_classes, self.in_channels), jnp.float32)
        b1 = self.param("fc1_bias", nn.initializers.zeros,
                        (self.num_classes,), jnp.float32)
        # diag(label_emb @ W1^T): score1[b, c] = label_emb[b, c, :] . W1[c, :]
        score1 = jnp.einsum(
            "bnc,nc->bn", label_emb.astype(jnp.float32), w1
        ) + b1
        score2 = nn.Dense(self.num_classes, kernel_init=normal_init,
                          dtype=jnp.float32, name="fc2")(gap.astype(jnp.float32))
        return score1 + score2

    def loss(self, cls_score: Array, gt_label: Array) -> dict:
        if self.softmax:
            ce = L.cross_entropy(cls_score, gt_label.reshape(-1))
            asy = ce  # softmax mode routes through plain loss (not the live path)
        else:
            asy = L.asymmetric_loss(
                cls_score, gt_label, gamma_pos=self.gamma_pos,
                gamma_neg=self.gamma_neg, clip=self.clip,
            )
        out = {}
        if self.double_loss:
            out["bce_loss"] = L.label_smooth_multilabel_loss(
                cls_score, gt_label, self.label_smooth_val,
                avg_factor=cls_score.shape[0],
            )
            out["asy_loss"] = asy * self.asy_loss_scale
        else:
            out["loss"] = asy
        return out

    def simple_test(self, cls_score: Array) -> Array:
        if self.softmax:
            return jax.nn.softmax(cls_score, axis=1)
        return jax.nn.sigmoid(cls_score)


class LinearClsHead(nn.Module):
    """Single-label linear head (heads/linear_head.py semantics)."""

    num_classes: int
    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.num_classes, kernel_init=normal_init,
                        dtype=jnp.float32, name="fc")(x.astype(jnp.float32))

    def loss(self, cls_score: Array, gt_label: Array) -> dict:
        return {"loss": L.cross_entropy(cls_score, gt_label)}

    def simple_test(self, cls_score: Array) -> Array:
        return jax.nn.softmax(cls_score, axis=1)


class MultiLabelLinearClsHead(nn.Module):
    """Multi-label linear head with ASL-style BCE
    (heads/multi_label_head.py: difficult (-1) ground truth mapped to
    positive via abs)."""

    num_classes: int
    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.num_classes, kernel_init=normal_init,
                        dtype=jnp.float32, name="fc")(x.astype(jnp.float32))

    def loss(self, cls_score: Array, gt_label: Array) -> dict:
        target = jnp.abs(gt_label)
        bce = L.binary_cross_entropy_with_logits(cls_score, target)
        return {"loss": jnp.mean(jnp.sum(bce, axis=-1) / cls_score.shape[-1])}

    def simple_test(self, cls_score: Array) -> Array:
        return jax.nn.sigmoid(cls_score)
