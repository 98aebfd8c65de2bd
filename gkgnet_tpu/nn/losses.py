"""Loss functions (pure jnp, fp32 islands).

Reference semantics:
  * ``asymmetric_loss`` — ASL (arXiv 2009.14119), mmcls
    losses/asymmetric_loss.py:9-71. Live config: gamma_pos=0, gamma_neg=2,
    clip=0.05, eps=1e-8 (configs/gkgnet/gkgnet_coco_576.py:32-36).
  * ``label_smooth_multilabel_loss`` — LabelSmoothLoss(mode='multi_label'):
    targets smoothed to {eps, 1-eps}, sigmoid BCE
    (losses/label_smooth_loss.py:122-126), reduced with
    ``avg_factor=batch`` (label_query_head.py:78).
  * ``weight_reduce_loss`` — mmcls reduction: 'mean' with avg_factor =>
    sum/avg_factor.

All losses compute in float32 regardless of input dtype (the fp16/bf16
clamp+log behavior of ASL needs fp32, SURVEY hard-part #5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def weight_reduce_loss(
    loss: Array,
    weight: Array | None = None,
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        if avg_factor is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / avg_factor
    raise ValueError(f"invalid reduction {reduction}")


def asymmetric_loss(
    pred: Array,
    target: Array,
    weight: Array | None = None,
    gamma_pos: float = 0.0,
    gamma_neg: float = 4.0,
    clip: float = 0.05,
    reduction: str = "mean",
    avg_factor: float | None = None,
    use_sigmoid: bool = True,
    eps: float = 1e-8,
) -> Array:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if use_sigmoid:
        p = jax.nn.sigmoid(pred)
    else:
        p = jax.nn.softmax(pred, axis=-1)
    if clip and clip > 0:
        pt = jnp.minimum(1.0 - p + clip, 1.0) * (1.0 - target) + p * target
    else:
        pt = (1.0 - p) * (1.0 - target) + p * target
    asym_weight = jnp.power(1.0 - pt, gamma_pos * target + gamma_neg * (1.0 - target))
    loss = -jnp.log(jnp.maximum(pt, eps)) * asym_weight
    if weight is not None and weight.ndim == 1 and pred.ndim > 1:
        weight = weight.reshape(-1, 1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy_with_logits(pred: Array, target: Array) -> Array:
    """Elementwise, numerically-stable sigmoid BCE (fp32)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def label_smooth_multilabel_loss(
    pred: Array,
    target: Array,
    label_smooth_val: float = 0.1,
    weight: Array | None = None,
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    eps = label_smooth_val
    smoothed = jnp.where(target > 0, 1.0 - eps, eps)
    loss = binary_cross_entropy_with_logits(pred, smoothed)
    if weight is not None and weight.ndim == 1 and pred.ndim > 1:
        weight = weight.reshape(-1, 1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def soft_cross_entropy(
    pred: Array,
    soft_target: Array,
    weight: Array | None = None,
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    """-sum(target * log_softmax(pred)) per sample (mmcls soft CE)."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    loss = -jnp.sum(soft_target.astype(jnp.float32) * logp, axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def cross_entropy(
    pred: Array,
    label: Array,
    weight: Array | None = None,
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    """Index-label CE."""
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, label[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def label_smooth_loss(
    pred: Array,
    target_onehot: Array,
    label_smooth_val: float = 0.1,
    mode: str = "classy_vision",
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    """Single-label smoothing ('original' / 'classy_vision' modes,
    losses/label_smooth_loss.py:116-121)."""
    eps = label_smooth_val
    if mode == "classy_vision":
        eps = label_smooth_val / (1.0 + label_smooth_val)
    num_classes = pred.shape[-1]
    smooth = target_onehot.astype(jnp.float32) * (1.0 - eps) + eps / num_classes
    return soft_cross_entropy(pred, smooth, reduction=reduction, avg_factor=avg_factor)


def seesaw_loss(
    pred: Array,
    label: Array,
    cum_samples: Array,
    p: float = 0.8,
    q: float = 2.0,
    eps: float = 1e-2,
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    """Seesaw loss (mmcls losses/seesaw_loss.py essentials): per-pair
    mitigation by class-frequency ratio (**p) and compensation by relative
    prediction confidence (**q), applied to the negative-class logits of a
    softmax CE.

    Args:
      pred: (N, C) logits. label: (N,) int class ids.
      cum_samples: (C,) cumulative per-class sample counts.
    """
    pred = pred.astype(jnp.float32)
    n, c = pred.shape
    onehot = jax.nn.one_hot(label, c, dtype=jnp.float32)
    seesaw = jnp.ones((n, c), jnp.float32)
    if p > 0:
        ratio = cum_samples[None, :] / jnp.maximum(cum_samples[:, None], 1.0)
        mitigation = jnp.where(ratio < 1.0, ratio**p, 1.0)  # (C, C)
        seesaw = seesaw * mitigation[label]
    if q > 0:
        scores = jax.nn.softmax(pred, axis=-1)
        self_score = jnp.take_along_axis(
            scores, label[:, None].astype(jnp.int32), axis=-1)
        compensation = jnp.where(scores > self_score,
                                 (scores / jnp.maximum(self_score, 1e-12))**q,
                                 1.0)
        seesaw = seesaw * compensation
    pred_adj = pred + jnp.log(jnp.maximum(seesaw, eps)) * (1.0 - onehot)
    logp = jax.nn.log_softmax(pred_adj, axis=-1)
    loss = -jnp.sum(onehot * logp, axis=-1)
    return weight_reduce_loss(loss, None, reduction, avg_factor)


def contrastive_loss(
    feats_a: Array,
    feats_b: Array,
    temperature: float = 0.07,
) -> Array:
    """InfoNCE over paired features (mmcls losses/contrastive_loss.py
    essentials): positives are the diagonal pairs."""
    a = feats_a / jnp.linalg.norm(feats_a, axis=-1, keepdims=True)
    b = feats_b / jnp.linalg.norm(feats_b, axis=-1, keepdims=True)
    logits = (a @ b.T).astype(jnp.float32) / temperature
    labels = jnp.arange(a.shape[0])
    return cross_entropy(logits, labels)


def focal_loss(
    pred: Array,
    target: Array,
    weight: Array | None = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    reduction: str = "mean",
    avg_factor: float | None = None,
) -> Array:
    """Sigmoid focal loss (mmcls losses/focal_loss.py semantics)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    p = jax.nn.sigmoid(pred)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * jnp.power(pt, gamma)
    loss = binary_cross_entropy_with_logits(pred, target) * focal_weight
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def center_loss(feats: Array, labels: Array, centers: Array) -> Array:
    """Center loss (Wen et al. ECCV'16; reference losses/center_loss.py —
    registered there but on no live GKGNet path). Squared distance of
    each feature to its class center, mean over the batch. ``centers``
    is a learnable (num_classes, feat_dim) table the caller owns (the
    reference holds it as an nn.Parameter)."""
    f32 = feats.astype(jnp.float32)
    c32 = centers.astype(jnp.float32)
    distmat = (jnp.sum(f32 * f32, axis=1, keepdims=True)
               - 2.0 * f32 @ c32.T
               + jnp.sum(c32 * c32, axis=1)[None, :])
    onehot = jax.nn.one_hot(labels, centers.shape[0], dtype=jnp.float32)
    dist = jnp.clip(distmat * onehot, 1e-12, 1e12)
    return jnp.sum(dist) / feats.shape[0]


def triplet_loss(feats: Array, labels: Array, margin: float = 0.3,
                 distance: str = "euclidean") -> Array:
    """Batch-hard triplet loss (Hermans et al.; reference
    losses/trilet_loss.py — registered, unused by GKGNet). For each
    anchor: hardest positive (max same-label distance) vs hardest
    negative (min other-label distance), hinged at ``margin``. The
    reference's per-row python mining loop becomes masked reductions."""
    f32 = feats.astype(jnp.float32)
    n = f32.shape[0]
    if distance == "euclidean":
        sq = jnp.sum(f32 * f32, axis=1)
        dist = sq[:, None] - 2.0 * f32 @ f32.T + sq[None, :]
        dist = jnp.sqrt(jnp.clip(dist, 1e-12, None))
    elif distance == "cosine":
        norm = jnp.linalg.norm(f32, axis=1, keepdims=True)
        ln = f32 / norm
        dist = -(ln @ ln.T)
    else:
        raise KeyError(f"Unsupported distance: {distance}")
    same = labels[:, None] == labels[None, :]
    big = jnp.float32(1e12)
    dist_ap = jnp.max(jnp.where(same, dist, -big), axis=1)
    dist_an = jnp.min(jnp.where(same, big, dist), axis=1)
    # MarginRankingLoss(y=1): mean(max(0, margin - (an - ap)))
    return jnp.mean(jnp.maximum(0.0, margin - (dist_an - dist_ap)))
