# GKGNet-S multi-label fine-tune on PASCAL VOC 2007 @ 448^2, single chip
# (BASELINE.json config 2). Recipe: the COCO 576 recipe shrunk to 448 with
# a shorter schedule; initialise from a COCO-trained checkpoint via
# ``load_from``. The reference publishes VOC SOTA in its paper
# (README.md:2-7) but ships no VOC config; semantics follow upstream mmcls
# (difficult labels -> -1 at eval, abs() at train).
_base_ = ["gkgnet_coco_576.py"]

work_dir = "./work_dirs/gkgnet_voc_448"
crop_size = 448

model = dict(arch="s", n_classes=20, size=448)

img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

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

data = dict(
    samples_per_device=16,
    workers=8,
    train=dict(
        type="VOC",
        data_prefix="data/VOCdevkit/VOC2007",
        ann_file="data/VOCdevkit/VOC2007/ImageSets/Main/trainval.txt",
        pipeline=train_pipeline,
    ),
    val=dict(
        type="VOC",
        data_prefix="data/VOCdevkit/VOC2007",
        ann_file="data/VOCdevkit/VOC2007/ImageSets/Main/test.txt",
        pipeline=test_pipeline,
        test_mode=True,
    ),
    test=dict(
        type="VOC",
        data_prefix="data/VOCdevkit/VOC2007",
        ann_file="data/VOCdevkit/VOC2007/ImageSets/Main/test.txt",
        pipeline=test_pipeline,
        test_mode=True,
    ),
)

sampler = dict(type="DistributedSampler")  # no repeat-aug on the small set

runner = dict(max_epochs=40)
lr_config = dict(policy="step", step=[10, 25], gamma=0.1, warmup="linear",
                 warmup_ratio=1e-3, warmup_iters=2, warmup_by_epoch=True)
optimizer = dict(lr=5e-5)

# fine-tune: start from a COCO-trained GKGNet-S checkpoint (head reshaped
# 80 -> 20 classes by the loader's shape filter)
load_from = None

mesh = dict(data=1, graph=1)  # single chip
