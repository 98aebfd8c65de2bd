# GKGNet-S high-res 768^2 with larger k, edge-partitioned across hosts
# (BASELINE.json config 5): the (data x graph) mesh splits each image's
# query-node/edge set over the 'graph' axis. With graph>1 the graph convs
# route through the explicit shard_map paths (parallel/edge_partition.py).
# Default schedule is one all_gather of the (pooled, tiny) target shard —
# at these shapes the ICI transfer is ~0.01% of the selection kernel, so
# the ppermute ring's per-step launches/merge cost more than the transfer
# they hide (analytic model in parallel/sharding.py; measurements in
# SCALING_r04.json). Opt into the ring with mesh=dict(..., overlap=True).
_base_ = ["gkgnet_coco_576.py"]

work_dir = "./work_dirs/gkgnet_coco_768_dist"
crop_size = 768

model = dict(arch="s", size=768, k=16, k_label_gcn=16)

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
    samples_per_device=4,
    train=dict(dataset=dict(pipeline=train_pipeline)),
    val=dict(pipeline=test_pipeline),
    test=dict(pipeline=test_pipeline),
)

# 2D mesh: data parallel across hosts (DCN), edge/graph partition within a
# host slice (ICI). data=None -> fill with n_devices // graph.
# overlap=False: single all_gather of target shards (the measured winner —
# see module comment above).
mesh = dict(data=None, graph=4, overlap=False)
