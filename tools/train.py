#!/usr/bin/env python
"""Training CLI (reference tools/train.py + apis/train.py, TPU-native).

Single host:  python tools/train.py configs/gkgnet_coco_576.py
Multi-host:   launch one process per host with JAX coordinator env set and
              pass --multihost (jax.distributed.initialize; the data axis
              spans hosts over DCN, the graph axis stays on ICI).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a GKGNet-TPU model")
    p.add_argument("config")
    p.add_argument("--work-dir")
    p.add_argument("--resume-from")
    p.add_argument("--load-from")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--deterministic", action="store_true",
                   help="fully deterministic run: forces a fixed seed "
                        "(reference set_random_seed(deterministic=True), "
                        "tools/train.py:111-151; XLA compilation and the "
                        "explicit-generator host pipeline are already "
                        "bitwise-reproducible, so this only pins the seed)")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="host:port for jax.distributed (default: cluster "
                        "auto-detect — SLURM/OMPI env)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="key=value deep overrides")
    return p.parse_args()


def main():
    args = parse_args()

    from gkgnet_tpu.utils.env import apply_env_platform

    apply_env_platform()

    import jax

    if args.multihost:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from gkgnet_tpu.core.builder import build_dataset, build_model
    from gkgnet_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
    from gkgnet_tpu.core.config import Config, parse_cfg_option
    from gkgnet_tpu.core.optim import build_optimizer
    from gkgnet_tpu.core.schedules import build_lr_schedule
    from gkgnet_tpu.core.trainer import (
        create_train_state, make_device_normalize, make_eval_step,
        make_train_step, pipeline_device_norm)
    from gkgnet_tpu.data.loader import build_dataloader
    from gkgnet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from gkgnet_tpu.parallel.sharding import graph_sharding
    from gkgnet_tpu.utils.logging import (
        JsonLogWriter, ScalarMeter, get_logger)

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options({
        k: parse_cfg_option(v) for k, v in
        (opt.split("=", 1) for opt in args.cfg_options)})
    if args.work_dir:
        cfg.work_dir = args.work_dir
    if args.max_epochs:
        cfg["runner"]["max_epochs"] = args.max_epochs
    seed = args.seed if args.seed is not None else cfg.get("seed", None)
    if args.deterministic and seed is None:
        seed = 0
    if seed is None:
        # reference init_random_seed: rank 0 draws, broadcasts to all
        # (apis/train.py:34-64)
        import numpy as np

        seed = int(np.random.SeedSequence().entropy % (2**31))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            seed = int(multihost_utils.broadcast_one_to_all(
                jax.numpy.int32(seed)))

    work_dir = cfg.get("work_dir", "./work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    timestamp = time.strftime("%Y%m%d_%H%M%S")
    logger = get_logger(log_file=os.path.join(work_dir, f"{timestamp}.log"))
    jlog = JsonLogWriter(os.path.join(work_dir, f"{timestamp}.log.json"))
    cfg.dump(os.path.join(work_dir, "config.json"))

    rank, world = jax.process_index(), jax.process_count()
    from gkgnet_tpu.utils.env import collect_env
    env_info = collect_env()
    logger.info("Environment:\n" + "\n".join(
        f"    {k}: {v}" for k, v in env_info.items()))
    logger.info(f"devices={jax.device_count()} local={jax.local_device_count()} "
                f"host {rank}/{world} seed={seed} "
                f"deterministic={args.deterministic}")

    mesh_cfg = cfg.get("mesh", {"data": None, "graph": 1})
    mesh = make_mesh(mesh_cfg.get("data"), mesh_cfg.get("graph", 1))
    data_size = mesh.devices.shape[0]

    # ------------------------------------------------------------------ data
    train_ds = build_dataset(cfg.data["train"])
    val_ds = build_dataset(cfg.data["val"]) if cfg.get("evaluation") else None
    per_device = cfg.data.get("samples_per_device", 16)
    local_batch = per_device * jax.local_device_count() // max(
        mesh_cfg.get("graph", 1), 1)
    global_batch = per_device * data_size
    sampler_type = cfg.get("sampler", {}).get("type")
    train_loader = build_dataloader(
        train_ds, local_batch, cfg.data.get("workers", 8),
        num_replicas=world, rank=rank, shuffle=True,
        sampler=sampler_type, seed=seed, drop_last=True,
        mode=cfg.data.get("loader_mode", "threads"))
    steps_per_epoch = len(train_loader)
    logger.info(f"train dataset: {len(train_ds)} samples, "
                f"{steps_per_epoch} steps/epoch, global batch {global_batch}")
    if steps_per_epoch == 0:
        raise ValueError(
            "0 train steps/epoch — dataset smaller than one batch (note: "
            "RepeatAugSampler truncates to multiples of selected_round=256)")

    # ----------------------------------------------------------------- model
    model = build_model(cfg.model)
    size = cfg.model["size"]
    sample = jnp.zeros((global_batch, size, size, 3))
    lr_cfg = dict(cfg.lr_config)
    lr_cfg["base_lr"] = cfg.optimizer["lr"]
    lr_schedule = build_lr_schedule(lr_cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(seed)
    # fp16 = dict(loss_scale="dynamic") enables the mmcv-style dynamic loss
    # scaler (reference cfg:146); pointless for the default bf16 recipe.
    fp16_cfg = cfg.get("fp16") or {}
    dyn_scale = fp16_cfg.get("loss_scale") == "dynamic"
    state = create_train_state(model, rng, sample, optax.sgd(1e-3),
                               ema=args.ema or cfg.get("ema", {}).get("enabled"),
                               dynamic_loss_scale=dyn_scale)
    opt_cfg = dict(cfg.optimizer)
    tx = build_optimizer(
        state.params, lr_schedule, opt_cfg.get("type", "adamw"),
        opt_cfg.get("weight_decay", 0.05), tuple(opt_cfg.get("betas", (0.9, 0.999))),
        opt_cfg.get("eps", 1e-8), opt_cfg.get("grad_clip_norm", 5.0),
        opt_cfg.get("paramwise_no_decay", True))
    state = state.replace(opt_state=tx.init(state.params))

    start_epoch = 0
    if args.resume_from or cfg.get("resume_from"):
        path = args.resume_from or cfg.resume_from
        state, epoch, meta = restore_checkpoint(path, state)
        start_epoch = epoch
        logger.info(f"resumed from {path} at epoch {epoch}")
    elif args.load_from or cfg.get("load_from"):
        path = args.load_from or cfg.load_from
        from gkgnet_tpu.core.checkpoint import load_params_only
        state = state.replace(params=load_params_only(path, state.params))
        logger.info(f"loaded weights from {path}")

    state = replicate_state(state, mesh)
    ema_cfg = cfg.get("ema", {})
    ema_on = bool(args.ema or ema_cfg.get("enabled"))
    # batch-level mixup/cutmix from train_cfg.augments
    # (reference classifiers/image.py:56-77)
    from gkgnet_tpu.nn.augment import build_batch_augment
    batch_augment = build_batch_augment(
        cfg.get("model", {}).get("train_cfg", {}).get("augments"))
    train_step = make_train_step(
        model, tx, lr_schedule=lr_schedule,
        ema_momentum=ema_cfg.get("momentum", 2e-4),
        ema_warmup=ema_cfg.get("warmup", 100),
        dynamic_loss_scale=dyn_scale,
        batch_augment=batch_augment)
    eval_step = make_eval_step(model)
    # with EMA on, the EvalHook is effectively double-registered
    # (reference apis/train.py:187-207): raw and EMA weights both scored
    eval_step_ema = make_eval_step(model, use_ema=True) if ema_on else None

    tb = None
    if cfg.get("log_config", {}).get("tensorboard") and rank == 0:
        from gkgnet_tpu.utils.tensorboard import TensorboardWriter
        tb = TensorboardWriter(os.path.join(work_dir, "tf_logs"))

    # two-phase workflow: [('train', 1), ('val', 1)] adds a val-mode LOSS
    # pass after every train epoch (reference mmcv workflow,
    # tools/train.py:186-196 + EpochBasedRunner.val)
    workflow = cfg.get("workflow") or [("train", 1)]
    do_val_loss = any(tuple(w)[0] == "val" for w in workflow)

    # ------------------------------------------------------------------ loop
    max_epochs = cfg["runner"]["max_epochs"]
    log_interval = cfg.get("log_config", {}).get("interval", 50)
    eval_interval = cfg.get("evaluation", {}).get("interval", 1)
    ckpt_interval = cfg.get("checkpoint_config", {}).get("interval", 1)
    best_metric, best_epoch = -1.0, -1
    meter = ScalarMeter()
    base_rng = jax.random.PRNGKey(seed + 1)

    from gkgnet_tpu.parallel.mesh import sync_processes
    # uint8 host->device transfer + on-device normalize when the train
    # pipeline's Normalize defers (device=True): 4x fewer bytes per batch
    dev_norm = make_device_normalize(pipeline_device_norm(
        find_pipeline_cfg(cfg.data.get("train", {}))))
    aot = {}
    with graph_sharding(mesh, overlap=mesh_cfg.get("overlap", False)):
        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(epoch)
            t_data = time.perf_counter()
            for it, batch in enumerate(train_loader):
                batch = shard_batch(
                    {"img": batch["img"], "gt_label": batch["gt_label"]}, mesh)
                batch["img"] = dev_norm(batch["img"])
                data_time = time.perf_counter() - t_data
                if "train" not in aot:
                    # multi-host: AOT-compile, then line ranks up on the
                    # coordination-service barrier BEFORE the first
                    # dispatch — a new executable's gloo communicator
                    # only waits ~30 s to form, and concurrent multi-
                    # minute compiles skew ranks past that (measured).
                    # Single-process keeps the plain jit dispatch (the
                    # axon TPU plugin rejects AOT executions).
                    if world > 1:
                        aot["train"] = train_step.lower(
                            state, batch, base_rng).compile()
                        sync_processes("train_compiled")
                    else:
                        aot["train"] = train_step
                state, logs = aot["train"](state, batch, base_rng)
                meter.update({"data_time": data_time})
                if (it + 1) % log_interval == 0:
                    logs = jax.device_get(logs)
                    meter.update(logs)
                    avg = meter.average(log_interval)
                    msg = " ".join(f"{k}={v:.4g}" for k, v in sorted(avg.items()))
                    logger.info(f"Epoch [{epoch + 1}/{max_epochs}]"
                                f"[{it + 1}/{steps_per_epoch}] {msg}")
                    jlog.write("train", epoch + 1, it + 1, avg)
                    if tb is not None:
                        tb.add_scalars(avg, epoch * steps_per_epoch + it + 1,
                                       prefix="train/")
                        tb.flush()
                t_data = time.perf_counter()

            if do_val_loss and val_ds is not None:
                vl = run_val_loss(val_ds, model, state, local_batch, cfg,
                                  mesh, world, rank)
                vl = {k: float(v) for k, v in vl.items()}
                if rank == 0 and vl:
                    msg = " ".join(f"{k}={v:.4g}" for k, v in sorted(vl.items()))
                    logger.info(f"Epoch(val) [{epoch + 1}] {msg}")
                    jlog.write("val_loss", epoch + 1, steps_per_epoch, vl)

            if val_ds is not None and (epoch + 1) % eval_interval == 0:
                scores = run_eval(val_ds, eval_step, state, local_batch,
                                  cfg, mesh, world, rank)
                scores_ema = None
                if eval_step_ema is not None:
                    scores_ema = run_eval(val_ds, eval_step_ema, state,
                                          local_batch, cfg, mesh, world, rank)
                # metrics on EVERY rank (scores are the allgathered
                # global result, identical everywhere) so the best-
                # checkpoint decision and the orbax save — which needs
                # all processes to participate — stay in lockstep;
                # logging/TB stay rank-0-only
                eval_logger = logger if rank == 0 else None
                metrics_dict = val_ds.evaluate(scores, logger=eval_logger)
                key = cfg.get("evaluation", {}).get("save_best", "mAP")
                candidates = [(metrics_dict.get(key, -1), "raw")]
                if scores_ema is not None:
                    ema_metrics = val_ds.evaluate(scores_ema,
                                                  logger=eval_logger)
                    metrics_dict.update(
                        {f"{k}_ema": v for k, v in ema_metrics.items()})
                    candidates.append((ema_metrics.get(key, -1), "ema"))
                if rank == 0:
                    jlog.write("val", epoch + 1, steps_per_epoch, metrics_dict)
                    if tb is not None:
                        tb.add_scalars(metrics_dict, epoch + 1, prefix="val/")
                        tb.flush()
                score, source = max(candidates)
                if score > best_metric:
                    best_metric = score
                    best_epoch = epoch + 1
                    save_checkpoint(os.path.join(work_dir, "best"),
                                    jax.device_get(state), epoch + 1,
                                    {"metric": best_metric,
                                     "weights": source})
                    if rank == 0:
                        logger.info(
                            f"new best {key}={best_metric:.4f} ({source})")

            if (epoch + 1) % ckpt_interval == 0:
                save_checkpoint(
                    os.path.join(work_dir, "checkpoints"),
                    jax.device_get(state), epoch + 1,
                    {"epoch": epoch + 1,
                     "CLASSES": list(getattr(train_ds, "CLASSES", []))},
                    max_to_keep=cfg.get("checkpoint_config", {}).get(
                        "max_to_keep", 3))

    logger.info(f"done. best={best_metric:.4f} @ epoch {best_epoch}")


_VAL_LOSS_STEP = {}


def find_pipeline_cfg(d):
    """Pipeline list through dataset-wrapper nesting (train=dict(dataset=
    dict(pipeline=...)) vs val=dict(pipeline=...))."""
    if not isinstance(d, dict):
        return None
    if "pipeline" in d:
        return d["pipeline"]
    if "dataset" in d:
        return find_pipeline_cfg(d["dataset"])
    return None


def run_val_loss(val_ds, model, state, local_batch, cfg, mesh, world, rank):
    """Val-mode LOSS pass (no optimizer, eval BN) over the val set — the
    mmcv workflow [('train',1),('val',1)] phase. Uses the dataset's gt
    labels by loader order (the val pipeline collects imgs only); loss
    averaged exactly across hosts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gkgnet_tpu.data.loader import build_dataloader
    from gkgnet_tpu.nn.classifier import parse_losses
    from gkgnet_tpu.parallel.mesh import shard_batch

    if id(model) not in _VAL_LOSS_STEP:
        loss_head = model.build_loss_head()

        @jax.jit
        def step(state, imgs, gt):
            score, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": state.constants}, imgs, train=False)
            total, logs = parse_losses(loss_head.loss(score, gt))
            return logs

        _VAL_LOSS_STEP[id(model)] = step
    step = _VAL_LOSS_STEP[id(model)]

    gts = val_ds.get_gt_labels().astype(np.float32)
    my_rows = np.arange(len(val_ds))[rank::world]
    loader = build_dataloader(
        val_ds, local_batch, cfg.data.get("workers", 8),
        num_replicas=world, rank=rank, shuffle=False, sampler=None,
        seed=0, drop_last=False)
    from gkgnet_tpu.parallel.mesh import sync_processes
    compiled = {}
    from gkgnet_tpu.core.trainer import (make_device_normalize,
                                          pipeline_device_norm)
    dev_norm = make_device_normalize(pipeline_device_norm(
        find_pipeline_cfg(cfg.data.get("val", {}))))
    sums, count = {}, 0
    pos = 0
    for batch in loader:
        imgs = batch["img"]
        n = imgs.shape[0]
        gt = gts[my_rows[pos:pos + n]]
        pos += n
        pad = local_batch - n
        if pad:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], pad, axis=0)], axis=0)
            gt = np.concatenate([gt, np.repeat(gt[-1:], pad, axis=0)], axis=0)
        sb = shard_batch({"img": imgs, "gt_label": gt}, mesh)
        sb["img"] = dev_norm(sb["img"])
        # the step's log scalars are means over the GLOBAL batch (every
        # process contributes its shard and sees the same replicated
        # value), so weighting by the local valid count already averages
        # the whole set; trailing-batch pad rows contribute to the mean
        # like the reference's mmcv val workflow (no unpadding there).
        if "c" not in compiled:
            # multi-host: AOT-compile THEN barrier — a new executable's
            # gloo communicator only waits ~30 s to form, and concurrent
            # multi-minute compiles skew ranks past it (measured).
            # Single-process: plain jit (the axon TPU plugin rejects AOT
            # executions).
            if world > 1:
                compiled["c"] = step.lower(
                    state, sb["img"], sb["gt_label"]).compile()
                sync_processes("val_loss_compiled", block_on=state.params)
            else:
                compiled["c"] = step
        logs = jax.device_get(compiled["c"](state, sb["img"],
                                            sb["gt_label"]))
        for k, v in logs.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
        count += n
    return {k: v / max(count, 1) for k, v in sums.items()}


def run_eval(val_ds, eval_step, state, local_batch, cfg, mesh, world, rank):
    """Sharded, order-preserving evaluation (the reference's multi_gpu_test +
    ordered collect, apis/test.py:260-387 — here the per-host shard order is
    deterministic so rank-0 reassembly is a simple gather)."""
    import jax
    import numpy as np

    from gkgnet_tpu.data.loader import build_dataloader
    from gkgnet_tpu.parallel.mesh import shard_batch

    loader = build_dataloader(
        val_ds, local_batch, cfg.data.get("workers", 8),
        num_replicas=world, rank=rank, shuffle=False, sampler=None,
        seed=0, drop_last=False)
    from gkgnet_tpu.parallel.mesh import sync_processes
    from gkgnet_tpu.core.trainer import (make_device_normalize,
                                          pipeline_device_norm)
    dev_norm = make_device_normalize(pipeline_device_norm(
        find_pipeline_cfg(cfg.data.get("val", {}))))
    compiled = {}
    chunks = []
    for batch in loader:
        imgs = batch["img"]
        pad = 0
        if imgs.shape[0] < local_batch:
            pad = local_batch - imgs.shape[0]
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], pad, axis=0)], axis=0)
        sb = shard_batch({"img": imgs}, mesh)
        sb["img"] = dev_norm(sb["img"])
        if "c" not in compiled:
            # AOT-compile + barrier, multi-host only (see run_val_loss)
            if world > 1:
                compiled["c"] = eval_step.lower(state, sb["img"]).compile()
                sync_processes("eval_compiled", block_on=state.params)
            else:
                compiled["c"] = eval_step
        # multi-host: jit outputs are GLOBAL arrays; collect only this
        # process's rows (its own loader shard + its own pad)
        from gkgnet_tpu.parallel.mesh import local_batch_rows
        scores = local_batch_rows(compiled["c"](state, sb["img"]))
        if pad:
            scores = scores[:-pad]
        chunks.append(scores)
    local = np.concatenate(chunks, axis=0)
    if world == 1:
        return local
    # multi-host: interleaved shards (rank r holds indices r::world)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local)
    n_total = len(val_ds)
    out = np.zeros((n_total, local.shape[1]), local.dtype)
    for r in range(world):
        rows = gathered[r][: len(range(r, n_total, world))]
        out[r::world] = rows
    return out


if __name__ == "__main__":
    main()
