"""Optimizers with mmcv-style paramwise weight-decay rules.

Live config (configs/gkgnet/gkgnet_coco_576.py:110-126): AdamW lr 1e-4,
wd 0.05, betas (0.9, 0.999), eps 1e-8, ``norm_decay_mult=0`` and
``bias_decay_mult=0`` (norm scales/biases and every bias excluded from
decay), gradient clipping at global-norm 5.

Also provides LAMB (the reference registers core/optimizers/lamb.py; unused
by the live config) via optax.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def no_decay_mask(params) -> "jax.tree_util.PyTreeDef":
    """True where decay applies. BatchNorm params are named scale/bias in
    this framework and every conv/dense bias is named 'bias', so the mmcv
    ``norm_decay_mult=0 / bias_decay_mult=0`` rule reduces to: no decay for
    leaves named 'bias' or 'scale' (+ prelu 'alpha')."""

    def decayed(path, _):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf not in ("bias", "scale", "alpha")

    return jax.tree_util.tree_map_with_path(decayed, params)


def build_optimizer(
    params,
    learning_rate: float | Callable,
    optimizer: str = "adamw",
    weight_decay: float = 0.05,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
    grad_clip_norm: float | None = 5.0,
    paramwise_no_decay: bool = True,
) -> optax.GradientTransformation:
    mask = no_decay_mask(params) if paramwise_no_decay else None
    if optimizer == "adamw":
        tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay, mask=mask)
    elif optimizer == "lamb":
        tx = optax.lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                        weight_decay=weight_decay, mask=mask)
    elif optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.sgd(learning_rate, momentum=betas[0]),
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx
