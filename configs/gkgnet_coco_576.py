# GKGNet-S on MS-COCO multi-label @ 576^2 — the live recipe
# (reference configs/gkgnet/gkgnet_coco_576.py, TPU-adapted: bf16 instead of
# fp16 dynamic loss scale; NHWC pipeline; mesh-parallel instead of NCCL DDP).

work_dir = "./work_dirs/gkgnet_coco_576"

model = dict(
    arch="s",
    k=9,
    k_label_gcn=9,
    num_group=2,
    drop_path=0.1,
    n_classes=80,
    size=576,
    num_gcn=1,
    dtype="bfloat16",
    head=dict(
        gamma_pos=0.0,
        gamma_neg=2.0,
        clip=0.05,
        asy_loss_scale=10.0,
        label_smooth_val=0.1,
    ),
)

img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
# On hosts where the fp32 batch transfer binds (remote-tunneled chips
# measured ~0.3 s of a 0.48 s step), add device=True to the Normalize
# entries below: the batch then ships uint8 (4x fewer bytes) and the
# train/eval loops normalize on-chip (core/trainer.device_normalize).
# Deployment/export artifacts keep expecting normalized fp32 input, so
# the default stays host-side. NOTE: on the axon remote-TPU tunnel,
# device=True is effectively REQUIRED for multi-hour training runs —
# the plugin client leaks the full host buffer of every device_put
# (~32 MB/step at fp32, tools/exp_leak.py; two 60-epoch runs were
# OOM-killed at 129 GB before the leak was isolated), and uint8
# transfer cuts the leak 4x (see configs/gkgnet_synthetic_576_long.py).
crop_size = 576

train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="CropMixup", p=0.5, size=crop_size, scale=0.01, number=234),
    dict(type="RandomFlip", flip_prob=0.5, direction="horizontal"),
    dict(type="RandomErasing", erase_prob=0.5, mode="rand",
         min_area_ratio=0.02, max_area_ratio=1 / 3,
         fill_color=img_norm["mean"], fill_std=img_norm["std"]),
    dict(type="ColorJitter", brightness=0.4, contrast=0.4, saturation=0.4),
    dict(type="Trivial", p=1.0),
    dict(type="Normalize", **img_norm),
    dict(type="Collect", keys=("img", "gt_label")),
]

test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", size=crop_size, backend="pillow",
         interpolation="bicubic"),
    dict(type="Normalize", **img_norm),
    dict(type="Collect", keys=("img",)),
]

sampler = dict(type="RepeatAugSampler")

data = dict(
    samples_per_device=16,
    workers=8,
    # process-pool augmentation workers: the train stack
    # (CropMixup/Trivial) is GIL-bound under threads
    loader_mode="processes",
    train=dict(
        type="ClassBalancedDataset",
        oversample_thr=0.01,
        dataset=dict(
            type="COCO",
            data_prefix="data/coco/train2014",
            ann_file="data/coco/train.data",
            pipeline=train_pipeline,
        ),
    ),
    val=dict(
        type="COCO",
        data_prefix="data/coco/val2014",
        ann_file="data/coco/val_test.data",
        pipeline=test_pipeline,
        test_mode=True,
    ),
    test=dict(
        type="COCO",
        data_prefix="data/coco/val2014",
        ann_file="data/coco/val_test.data",
        pipeline=test_pipeline,
        test_mode=True,
    ),
)

evaluation = dict(interval=1, save_best="mAP")
runner = dict(max_epochs=80)

optimizer = dict(
    type="adamw",
    lr=1e-4,
    weight_decay=0.05,
    eps=1e-8,
    betas=(0.9, 0.999),
    paramwise_no_decay=True,  # norm_decay_mult=0 + bias_decay_mult=0
    grad_clip_norm=5.0,
)

lr_config = dict(
    policy="step",
    step=[10, 50],
    gamma=0.1,
    warmup="linear",
    warmup_ratio=1e-3,
    warmup_iters=5,
    warmup_by_epoch=True,
)

ema = dict(enabled=False, momentum=2e-4, warmup=100)

checkpoint_config = dict(interval=1, max_to_keep=3)
# TextLogger + TensorboardLogger @50 it (reference cfg:136-141)
log_config = dict(interval=50, tensorboard=True)

# mesh: data x graph; graph=1 -> pure DP
mesh = dict(data=None, graph=1)

precision = "bfloat16"
seed = 0
load_from = None
resume_from = None
