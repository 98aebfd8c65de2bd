#!/usr/bin/env python
"""Evaluation CLI (reference tools/test.py): run a checkpoint over the test
set, print the full COCO metric dict, optionally dump raw scores."""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test a GKGNet-TPU model")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="checkpoint dir (omit to eval random init)")
    p.add_argument("--out", help="dump raw scores (pickle)")
    p.add_argument("--metrics-out", help="dump metric dict (json)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--ema", action="store_true", help="evaluate EMA weights")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host eval: jax.distributed.initialize; each "
                        "process scores an interleaved dataset shard, "
                        "results allgathered in order (the reference's "
                        "multi_gpu_test + collect_results, apis/test.py:260-387)")
    p.add_argument("--coordinator", default=None,
                   help="host:port for jax.distributed (default: cluster "
                        "auto-detect — SLURM/OMPI env)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cfg-options", nargs="+", default=[])
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
    from gkgnet_tpu.core.checkpoint import restore_checkpoint
    from gkgnet_tpu.core.config import Config, parse_cfg_option
    from gkgnet_tpu.core.trainer import (create_train_state,
                                         make_device_normalize,
                                         make_eval_step,
                                         pipeline_device_norm)
    from gkgnet_tpu.data.loader import build_dataloader
    from gkgnet_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from gkgnet_tpu.utils.logging import get_logger

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options({
        k: parse_cfg_option(v) for k, v in
        (opt.split("=", 1) for opt in args.cfg_options)})
    logger = get_logger()

    mesh_cfg = cfg.get("mesh", {"data": None, "graph": 1})
    mesh = make_mesh(mesh_cfg.get("data"), mesh_cfg.get("graph", 1))
    test_ds = build_dataset(cfg.data["test"])
    model = build_model(cfg.model)
    size = cfg.model["size"]
    batch = args.batch or cfg.data.get("samples_per_device", 16) * \
        mesh.devices.shape[0]

    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((batch, size, size, 3)), optax.sgd(1e-3), ema=args.ema)
    if args.checkpoint:
        # target-free raw restore: eval doesn't care about optimizer state
        raw, epoch, meta = restore_checkpoint(args.checkpoint)
        state = state.replace(
            params=raw["params"],
            batch_stats=raw.get("batch_stats") or state.batch_stats,
            constants=raw.get("constants") or state.constants,
            ema_params=(raw.get("ema_params") if args.ema
                        else state.ema_params),
        )
        logger.info(f"loaded {args.checkpoint} (epoch {epoch})")
    state = replicate_state(state, mesh)
    eval_step = make_eval_step(model, use_ema=args.ema)

    rank, world = jax.process_index(), jax.process_count()
    loader = build_dataloader(test_ds, batch, cfg.data.get("workers", 8),
                              num_replicas=world, rank=rank,
                              shuffle=False, drop_last=False)
    from gkgnet_tpu.parallel.mesh import sync_processes
    dev_norm = make_device_normalize(pipeline_device_norm(
        cfg.data.get("test", {}).get("pipeline")))
    compiled = {}
    chunks = []
    for i, b in enumerate(loader):
        imgs = b["img"]
        pad = batch - imgs.shape[0]
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)], 0)
        sb = shard_batch({"img": imgs}, mesh)
        sb["img"] = dev_norm(sb["img"])
        if "c" not in compiled:
            # multi-host: AOT-compile THEN barrier — a new executable's
            # gloo communicator only waits ~30 s; concurrent compiles on
            # a contended host skew ranks past it (measured). Single-
            # process: plain jit (the axon TPU plugin rejects AOT
            # executions).
            if world > 1:
                compiled["c"] = eval_step.lower(state, sb["img"]).compile()
                sync_processes("eval_compiled", block_on=state.params)
            else:
                compiled["c"] = eval_step
        # multi-host: the jit output is a GLOBAL array; fetch only this
        # process's rows (its own loader shard — the pad was appended to
        # this process's local batch, so it is dropped locally too)
        from gkgnet_tpu.parallel.mesh import local_batch_rows
        scores = local_batch_rows(compiled["c"](state, sb["img"]))
        chunks.append(scores[: len(scores) - pad] if pad else scores)
        if (i + 1) % 10 == 0 and rank == 0:
            logger.info(f"{(i + 1) * batch * world}/{len(test_ds)}")
    local = np.concatenate(chunks, 0)
    if world == 1:
        results = local
    else:
        # ordered collection: rank r scored indices r::world; reassemble
        # (device allgather instead of the reference's pickled-bytes
        # all_gather / tmpdir + barrier, apis/test.py:310-387)
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(local)
        n_total = len(test_ds)
        results = np.zeros((n_total, local.shape[1]), local.dtype)
        for r in range(world):
            results[r::world] = gathered[r][: len(range(r, n_total, world))]

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"dumped scores to {args.out}")

    metrics = test_ds.evaluate(results, logger=logger)
    print(json.dumps(metrics, indent=2))
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
