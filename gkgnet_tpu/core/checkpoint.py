"""Checkpoint save/resume (orbax) — the mmcv CheckpointHook + runner.resume
equivalent (reference: epoch-granularity full state with model/optimizer/
meta, configs/_base_/default_runtime.py:2, apis/train.py:209-212).

State layout: the full TrainState pytree (params, batch_stats, constants,
opt_state, ema_params, step) plus a JSON meta blob (epoch, CLASSES,
best metric). Checkpoints are sharding-aware (orbax restores to whatever
mesh the restore target is laid out on).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp


def _mgr(directory: str, max_to_keep: int | None = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        ),
    )


def save_checkpoint(directory: str, state, epoch: int, meta: dict | None = None,
                    max_to_keep: int | None = 3):
    """Multi-process: EVERY process must call this (orbax coordinates
    internally and only the primary host writes; a rank-0-only call
    deadlocks on orbax's cross-process barrier — measured). The meta
    sidecar is written by process 0 alone."""
    mgr = _mgr(directory, max_to_keep)
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    if meta is not None and jax.process_index() == 0:
        with open(os.path.join(directory, f"meta_{epoch}.json"), "w") as f:
            json.dump(meta, f)


def latest_epoch(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, target=None, epoch: int | None = None):
    """Restore a checkpoint. With ``target`` (abstract or concrete
    TrainState) the result has target's structure/shardings; with
    ``target=None`` the raw saved tree (dict of TrainState fields) is
    returned — use this for eval-side loads where the optimizer state
    structure may differ. Returns (state, epoch, meta)."""
    if epoch is None:
        epoch = latest_epoch(directory)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    mgr = _mgr(directory)
    if target is None:
        state = mgr.restore(epoch, args=ocp.args.StandardRestore())
    else:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    meta_path = os.path.join(directory, f"meta_{epoch}.json")
    meta: dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, epoch, meta


def load_params_only(directory: str, target_params, epoch: int | None = None):
    """Weights-only load (the reference's ``load_from``): restores just the
    params subtree from a full-state checkpoint."""
    state, _, _ = restore_checkpoint(directory, target_params, epoch)
    return state
