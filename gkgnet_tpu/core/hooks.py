"""Training-support services beyond the basic loop (reference mmcls/core/
hook family, functionalized):

  * ``precise_bn`` — recompute BN running stats over N batches before eval
    (core/hook/precise_bn_hook.py:22-180). Under pjit the moment reductions
    are already global, so no explicit allreduce step is needed.
  * ``ClassNumCheck`` — dataset.CLASSES vs head.num_classes consistency
    (core/hook/class_num_check_hook.py:7-73).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp


def precise_bn(model, state, batches: Iterable[dict], num_samples: int = 8192):
    """Recompute `batch_stats` as the average of per-batch moments over up
    to ``num_samples`` samples (PreciseBN). Returns state with new stats."""

    @jax.jit
    def stats_step(state, imgs):
        _, mutated = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "constants": state.constants},
            imgs, train=True, mutable=["batch_stats"],
            rngs={"droppath": jax.random.PRNGKey(0),
                  "dilation": jax.random.PRNGKey(0)},
        )
        return mutated["batch_stats"]

    # Per-batch moments: starting from zeroed stats, one BN update gives
    # new = (1-m)*0 + m*batch_moment, so batch_moment = new / m. Averaging
    # those over N batches is exactly PreciseBN.
    momentum = 0.1  # BatchNorm default, torch semantics
    zero_stats = jax.tree.map(jnp.zeros_like, state.batch_stats)
    seen = 0
    acc = None
    count = 0
    for batch in batches:
        imgs = batch["img"] if isinstance(batch, dict) else batch
        new_stats = stats_step(state.replace(batch_stats=zero_stats), imgs)
        moments = jax.tree.map(lambda s: s / momentum, new_stats)
        acc = moments if acc is None else jax.tree.map(jnp.add, acc, moments)
        count += 1
        seen += imgs.shape[0]
        if seen >= num_samples:
            break
    if acc is None:
        return state
    avg = jax.tree.map(lambda s: s / count, acc)
    return state.replace(batch_stats=avg)


def class_num_check(dataset, num_classes: int):
    """Raise if dataset.CLASSES disagrees with the head width."""
    classes = getattr(dataset, "CLASSES", None)
    if classes is None:
        return
    if len(classes) != num_classes:
        raise ValueError(
            f"dataset has {len(classes)} classes but head num_classes="
            f"{num_classes}")
