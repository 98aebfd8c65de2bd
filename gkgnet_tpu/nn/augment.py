"""Batch-level augmentations (reference models/utils/augment: Mixup/CutMix,
built from ``train_cfg.augments`` by ImageClassifier; unused by the live
GKGNet config but part of the classifier API surface).

Pure functions over device batches: NHWC images + (B, C) soft/multi-hot
labels, explicit PRNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def batch_mixup(rng: Array, imgs: Array, labels: Array, alpha: float = 0.2):
    """lam ~ Beta(alpha, alpha); mixes each sample with a shuffled partner."""
    rng_lam, rng_perm = jax.random.split(rng)
    lam = jax.random.beta(rng_lam, alpha, alpha)
    perm = jax.random.permutation(rng_perm, imgs.shape[0])
    mixed = lam * imgs + (1.0 - lam) * imgs[perm]
    mixed_labels = lam * labels + (1.0 - lam) * labels[perm]
    return mixed, mixed_labels


def batch_cutmix(rng: Array, imgs: Array, labels: Array, alpha: float = 1.0):
    """CutMix: paste a random box from a shuffled partner; label weight =
    box area fraction."""
    b, h, w, _ = imgs.shape
    rng_lam, rng_perm, rng_x, rng_y = jax.random.split(rng, 4)
    lam = jax.random.beta(rng_lam, alpha, alpha)
    perm = jax.random.permutation(rng_perm, b)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    cy = jax.random.randint(rng_y, (), 0, h)
    cx = jax.random.randint(rng_x, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    box = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
    mixed = jnp.where(box, imgs[perm], imgs)
    area = ((y2 - y1) * (x2 - x1)) / (h * w)
    lam_adj = 1.0 - area
    mixed_labels = lam_adj * labels + (1.0 - lam_adj) * labels[perm]
    return mixed, mixed_labels


def build_batch_augment(cfgs: list[dict] | None):
    """``train_cfg.augments``-style builder: list of {type, alpha, prob};
    one augment is sampled per step by probability."""
    if not cfgs:
        return None
    fns, probs = [], []
    for cfg in cfgs:
        t = cfg["type"].lower()
        alpha = cfg.get("alpha", 1.0)
        if "mixup" in t:
            fns.append(lambda r, i, l, a=alpha: batch_mixup(r, i, l, a))
        elif "cutmix" in t:
            fns.append(lambda r, i, l, a=alpha: batch_cutmix(r, i, l, a))
        else:
            raise ValueError(f"unknown batch augment {t}")
        probs.append(cfg.get("prob", 1.0 / len(cfgs)))
    probs = jnp.asarray(probs) / sum(probs)

    def apply(rng, imgs, labels):
        rng_pick, rng_aug = jax.random.split(rng)
        idx = jax.random.choice(rng_pick, len(fns), p=probs)
        branches = [lambda r, i, l, f=f: f(r, i, l) for f in fns]
        return jax.lax.switch(idx, branches, rng_aug, imgs, labels)

    return apply
