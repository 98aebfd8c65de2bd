# Full-recipe training-curve evidence run on synthetic COCO (round 4,
# VERDICT r3 next-#7): the REAL 576^2 recipe — CropMixup + Trivial +
# RandomErasing + ColorJitter, ClassBalanced + RepeatAug sampling, EMA,
# step LR with warmup, bf16 — on the learnable synthetic dataset from
# tools/make_synthetic_coco.py, sized so ~20 epochs run on one chip in
# tens of minutes. Epoch-scale knobs (steps, warmup, max_epochs) are the
# 80-epoch recipe compressed 4x; everything else inherits unchanged.

_base_ = ["gkgnet_coco_576.py"]

work_dir = "./work_dirs/gkgnet_synthetic_576"

data = dict(
    samples_per_device=8,
    workers=2,
    train=dict(dataset=dict(
        data_prefix="data/synthetic/train",
        ann_file="data/synthetic/train.data",
    )),
    val=dict(
        data_prefix="data/synthetic/val",
        ann_file="data/synthetic/val.data",
    ),
    test=dict(
        data_prefix="data/synthetic/val",
        ann_file="data/synthetic/val.data",
    ),
)

evaluation = dict(interval=5, save_best="mAP")
runner = dict(max_epochs=50)

# epoch-scale compression of the 80-epoch recipe: the lr steps sit at
# 70%/90% of the run like [10, 50]@80ep's warm phase would after its
# first drop; lr is raised 4x for the 200x-smaller dataset (global batch
# 8 vs 128 also shrinks the per-step signal)
optimizer = dict(lr=4e-4)

lr_config = dict(
    policy="step",
    step=[35, 45],
    gamma=0.1,
    warmup="linear",
    warmup_ratio=1e-3,
    warmup_iters=3,
    warmup_by_epoch=True,
)

# EMA horizon matched to the ~1600-step run (the 2e-4 production
# momentum averages over ~5000 steps and would never catch up here)
ema = dict(enabled=True, momentum=5e-3, warmup=100)
checkpoint_config = dict(interval=10, max_to_keep=1)
log_config = dict(interval=20, tensorboard=False)
