"""Functional training core: TrainState + jitted train/eval steps.

Replaces the reference's mmcv EpochBasedRunner + hook pipeline
(apis/train.py:86-213, core/fp16/hooks.py) with an idiomatic JAX design:

  * one pure ``train_step`` = forward (train-mode BN, DropPath rng) ->
    dual loss -> grad -> global-norm clip -> AdamW -> EMA, compiled once
    under jit/pjit. Under a device mesh the gradient all-reduce is fused
    into the backward by GSPMD (no DDP hook), and BatchNorm reductions are
    global (SyncBN) because the batch axis is sharded.
  * bf16 compute needs no loss scaling on TPU (the reference's fp16 dynamic
    loss scale, cfg:146, is a CUDA-ism); losses/grads accumulate in fp32.
    For strict fp16-parity experiments ``make_train_step(...,
    dynamic_loss_scale=True)`` reproduces the mmcv dynamic scaler (init
    2**16, x2 growth every 2000 finite steps, x0.5 backoff + skipped update
    on non-finite grads — core/fp16/hooks.py + mmcv LossScaler semantics).
  * EMA follows MyEMAHook (core/hook/my_ema.py): warmup momentum
    ``min(m, (1+t)/(warm_up+t))``, ``ema = (1-m)*ema + m*param``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gkgnet_tpu.nn.classifier import parse_losses

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    ema_params: Any = None
    # dynamic loss scaling (fp16 mode only; None when disabled)
    loss_scale: Any = None
    good_steps: Any = None


def create_train_state(
    model,
    rng: Array,
    sample_input: Array,
    tx: optax.GradientTransformation,
    ema: bool = False,
    dynamic_loss_scale: bool = False,
    init_scale: float = 2.0 ** 16,
) -> TrainState:
    variables = model.init(
        {"params": rng, "droppath": jax.random.fold_in(rng, 1),
         "dilation": jax.random.fold_in(rng, 2),
         "perturbed": jax.random.fold_in(rng, 3)},
        sample_input, train=False,
    )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree.map(lambda x: x, params) if ema else None,
        loss_scale=(jnp.asarray(init_scale, jnp.float32)
                    if dynamic_loss_scale else None),
        good_steps=(jnp.zeros((), jnp.int32)
                    if dynamic_loss_scale else None),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable[[Array, Array], dict] | None = None,
    lr_schedule: Callable | None = None,
    ema_momentum: float | None = None,
    ema_warmup: int = 100,
    donate: bool = True,
    dynamic_loss_scale: bool = False,
    scale_growth_interval: int = 2000,
    batch_augment: Callable | None = None,
):
    """Returns ``train_step(state, batch, rng) -> (state, log_vars)``.

    ``batch``: dict with ``img`` (B, H, W, 3) and ``gt_label`` (B, C).
    ``rng``: a base key; per-step streams are derived by folding in the step.
    ``batch_augment``: optional ``(rng, imgs, labels) -> (imgs, labels)``
    device-batch augment (mixup/cutmix) built by
    ``gkgnet_tpu.nn.augment.build_batch_augment`` from ``train_cfg.augments``
    — the reference wires these in ``ImageClassifier.forward_train``
    (classifiers/image.py:56-77).
    """
    if loss_fn is None:
        # the head's loss uses no parameters, so an unbound instance works
        if hasattr(model, "build_loss_head"):
            loss_fn = model.build_loss_head().loss
        else:
            from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS
            from gkgnet_tpu.nn.heads import LabelQueryHead
            in_channels = ARCH_SETTINGS[model.arch]["channels"][-1]
            head = LabelQueryHead(num_classes=model.n_classes,
                                  in_channels=in_channels,
                                  **(model.head_kwargs or {}))
            loss_fn = head.loss

    def train_step(state: TrainState, batch: dict, rng: Array):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {"droppath": jax.random.fold_in(step_rng, 0),
                "dilation": jax.random.fold_in(step_rng, 1),
                "perturbed": jax.random.fold_in(step_rng, 3)}
        imgs, gt = batch["img"], batch["gt_label"]
        if batch_augment is not None:
            imgs, gt = batch_augment(jax.random.fold_in(step_rng, 2), imgs, gt)

        def compute_loss(params):
            (cls_score, _), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats,
                 "constants": state.constants},
                imgs, train=True, rngs=rngs, mutable=["batch_stats"],
            )
            losses = loss_fn(cls_score, gt)
            total, log_vars = parse_losses(losses)
            return total, (log_vars, mutated["batch_stats"])

        if dynamic_loss_scale:
            scale = state.loss_scale

            def scaled_loss(params):
                total, aux = compute_loss(params)
                return total * scale, aux

            (_, (log_vars, new_stats)), grads = jax.value_and_grad(
                scaled_loss, has_aux=True)(state.params)
            grads = jax.tree.map(lambda g: g / scale, grads)
            finite = jnp.all(jnp.asarray([
                jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
            # non-finite grads -> zero them so tx.update stays finite, then
            # discard the whole update below (mmcv LossScaler skip semantics)
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        else:
            (_, (log_vars, new_stats)), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            finite = None

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_scale, new_good = state.loss_scale, state.good_steps
        if dynamic_loss_scale:
            keep = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)
            new_params = keep(new_params, state.params)
            new_opt_state = keep(new_opt_state, state.opt_state)
            new_stats = keep(new_stats, state.batch_stats)
            grown = finite & (state.good_steps + 1 >= scale_growth_interval)
            new_scale = jnp.where(
                finite, jnp.where(grown, state.loss_scale * 2.0,
                                  state.loss_scale),
                jnp.maximum(state.loss_scale * 0.5, 1.0))
            new_good = jnp.where(finite & ~grown, state.good_steps + 1, 0)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_momentum is not None:
            t = state.step.astype(jnp.float32)
            m = jnp.minimum(ema_momentum, (1.0 + t) / (ema_warmup + t))
            new_ema = jax.tree.map(
                lambda e, p: (1.0 - m) * e + m * p, state.ema_params, new_params)

        log_vars = dict(log_vars)
        log_vars["grad_norm"] = optax.global_norm(grads)
        if lr_schedule is not None:
            log_vars["lr"] = lr_schedule(state.step)
        if dynamic_loss_scale:
            log_vars["loss_scale"] = new_scale
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, ema_params=new_ema,
            loss_scale=new_scale, good_steps=new_good,
        )
        return new_state, log_vars

    # the axon remote-TPU plugin rejects donated-buffer executions with an
    # opaque INVALID_ARGUMENT at dispatch (measured round 4; it registers
    # under the canonical 'tpu' backend name, hence the plugin-registry
    # check); donation is a memory optimization only, so drop it there
    from gkgnet_tpu.utils.env import is_remote_tpu_tunnel

    donate = donate and not is_remote_tpu_tunnel()
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def pipeline_device_norm(pipeline_cfg):
    """(mean, std) if the pipeline's Normalize defers to the device
    (``device=True``), else None. Feed the result to
    ``make_device_normalize`` and apply it right after ``shard_batch`` —
    the batch then crosses host->device as uint8 (4x fewer bytes; on a
    remote-tunneled chip the fp32 transfer measured ~60% of the step)."""
    for t in pipeline_cfg or ():
        if isinstance(t, dict) and t.get("type") == "Normalize" \
                and t.get("device", False):
            return tuple(t["mean"]), tuple(t["std"])
    return None


def make_device_normalize(norm):
    """jitted (x - mean) / std for uint8 (B, H, W, 3) batches; identity
    passthrough for already-normalized float batches (mixed configs)."""
    if norm is None:
        return lambda img: img
    mean, std = norm

    @jax.jit
    def dev_norm(img):
        if img.dtype != jnp.uint8:
            return img
        return ((img.astype(jnp.float32)
                 - jnp.asarray(mean, jnp.float32))
                / jnp.asarray(std, jnp.float32))

    return dev_norm


def make_eval_step(model, use_ema: bool = False):
    """Returns ``eval_step(state, imgs) -> sigmoid scores (B, n_classes)``."""

    def eval_step(state: TrainState, imgs: Array):
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        cls_score, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "constants": state.constants},
            imgs, train=False,
        )
        return jax.nn.sigmoid(cls_score.astype(jnp.float32))

    return jax.jit(eval_step)
