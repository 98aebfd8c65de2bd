"""Learning-rate schedules (mmcv lr_updater semantics, as optax-style
step -> lr functions).

Live config (configs/gkgnet/gkgnet_coco_576.py:127-134): step policy,
milestones [10, 50] epochs, gamma 0.1, 5-epoch linear warmup from
``base_lr * warmup_ratio`` (mmcv LrUpdaterHook linear warmup:
``lr * (1 - (1 - t)(1 - ratio))``).

Also provides the reference's registered extras: cosine-annealing-with-
cooldown (core/hook/lr_updater.py:7-84) and a plateau-style reducer object
(core/hook/lr_updater.py:85-332 essentials) for the training loop.
"""

from __future__ import annotations

import math
from typing import Sequence


def step_lr_with_warmup(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 0,
    warmup_ratio: float = 1e-3,
):
    """``milestones`` are epochs; ``warmup_iters`` is in iterations."""
    milestone_iters = [m * steps_per_epoch for m in milestones]

    def schedule(step):
        import jax.numpy as jnp

        decays = sum(step >= m for m in milestone_iters)
        regular = base_lr * gamma ** decays
        if warmup_iters > 0:
            frac = jnp.minimum(step / warmup_iters, 1.0)
            k = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            warm = regular * k
            return jnp.where(step < warmup_iters, warm, regular)
        return regular * jnp.ones_like(jnp.asarray(step, jnp.float32))

    return schedule


def cosine_cooldown_lr(
    base_lr: float,
    total_steps: int,
    cool_down_ratio: float = 0.1,
    cool_down_time: int = 10,
    min_lr_ratio: float = 0.0,
    warmup_iters: int = 0,
    warmup_ratio: float = 1e-3,
):
    """CosineAnnealingCooldownLrUpdaterHook: cosine from base to
    base*min_lr_ratio over (total - cool_down_time) steps, then flat at
    base*cool_down_ratio."""

    def schedule(step):
        import jax.numpy as jnp

        anneal_steps = max(total_steps - cool_down_time, 1)
        t = jnp.minimum(step / anneal_steps, 1.0)
        target = base_lr * min_lr_ratio
        cos_lr = target + 0.5 * (base_lr - target) * (1 + jnp.cos(math.pi * t))
        lr = jnp.where(step >= anneal_steps, base_lr * cool_down_ratio, cos_lr)
        if warmup_iters > 0:
            frac = jnp.minimum(step / warmup_iters, 1.0)
            k = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            lr = jnp.where(step < warmup_iters, lr * k, lr)
        return lr

    return schedule


class ReduceLrOnPlateau:
    """Host-side plateau reducer (ReduceLrUpdaterHook semantics): call
    ``update(metric)`` each eval; ``scale`` multiplies the schedule output."""

    def __init__(self, factor=0.1, patience=3, threshold=1e-4, mode="max",
                 min_lr=0.0, cooldown=0):
        self.factor, self.patience, self.threshold = factor, patience, threshold
        self.mode, self.min_lr, self.cooldown = mode, min_lr, cooldown
        self.best = None
        self.num_bad = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def _is_better(self, metric):
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1 + self.threshold)
        return metric < self.best * (1 - self.threshold)

    def update(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.num_bad = 0
                self.cooldown_counter = self.cooldown
        return self.scale


def build_lr_schedule(cfg: dict, steps_per_epoch: int):
    """Config-driven builder mirroring lr_config semantics."""
    policy = cfg.get("policy", "step")
    base_lr = cfg["base_lr"]
    warmup_iters = cfg.get("warmup_iters", 0)
    if cfg.get("warmup_by_epoch"):
        warmup_iters *= steps_per_epoch
    if policy == "step":
        return step_lr_with_warmup(
            base_lr, steps_per_epoch, cfg["step"], cfg.get("gamma", 0.1),
            warmup_iters=warmup_iters,
            warmup_ratio=cfg.get("warmup_ratio", 1e-3),
        )
    if policy == "cosine":
        return cosine_cooldown_lr(
            base_lr, cfg["total_steps"],
            cfg.get("cool_down_ratio", 0.1), cfg.get("cool_down_time", 10),
            cfg.get("min_lr_ratio", 0.0), warmup_iters,
            cfg.get("warmup_ratio", 1e-3),
        )
    raise ValueError(f"unknown lr policy {policy}")
