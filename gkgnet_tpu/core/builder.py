"""Config -> object builders (the registry layer of the reference,
models/builder.py + datasets/builder.py, as plain dispatch)."""

from __future__ import annotations

import jax.numpy as jnp

from gkgnet_tpu.data.coco import CocoMultiLabel
from gkgnet_tpu.data.pipelines import build_pipeline
from gkgnet_tpu.data.wrappers import (
    ClassBalancedDataset,
    ConcatDataset,
    KFoldDataset,
    RepeatDataset,
)
from gkgnet_tpu.data.single_label import ImageListDataset
from gkgnet_tpu.data.voc import VOCMultiLabel
from gkgnet_tpu.nn.classifier import GKGNetClassifier

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
          "bf16": jnp.bfloat16, "fp32": jnp.float32,
          "float16": jnp.float16, "fp16": jnp.float16}

DATASETS = {"COCO": CocoMultiLabel, "VOC": VOCMultiLabel,
            "ImageList": ImageListDataset}


def build_dataset(cfg: dict):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if t == "ClassBalancedDataset":
        return ClassBalancedDataset(build_dataset(cfg["dataset"]),
                                    cfg["oversample_thr"])
    if t == "RepeatDataset":
        return RepeatDataset(build_dataset(cfg["dataset"]), cfg["times"])
    if t == "ConcatDataset":
        return ConcatDataset([build_dataset(c) for c in cfg["datasets"]])
    if t == "KFoldDataset":
        ds = build_dataset(cfg.pop("dataset"))
        return KFoldDataset(ds, **cfg)
    if t in DATASETS:
        pipeline = cfg.pop("pipeline", None)
        if pipeline is not None:
            pipeline = build_pipeline(pipeline)
        return DATASETS[t](pipeline=pipeline, **cfg)
    raise ValueError(f"unknown dataset type {t}")


def build_model(cfg: dict) -> GKGNetClassifier:
    cfg = dict(cfg)
    head = cfg.pop("head", None)
    dtype = DTYPES[cfg.pop("dtype", "float32")]
    # train_cfg.augments is consumed by the train driver (batch-level
    # mixup/cutmix, reference classifiers/image.py:56-77), not the module
    cfg.pop("train_cfg", None)
    neck = cfg.pop("neck", None)
    if neck is not None:
        cfg["neck_cfg"] = dict(neck)
    return GKGNetClassifier(dtype=dtype, head_kwargs=head, **cfg)
