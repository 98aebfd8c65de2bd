# GKGNet with the pvig_b backbone geometry @ 576^2 (BASELINE.json config 4):
# bigger graph width (channels 128..1024, 18 stage-3 blocks) to stress the
# gather/aggregate kernels. Arch 'b' follows upstream pyramid-ViG base
# (arXiv:2206.00272); the reference registry stops at t/s (gkgnet.py:122-149).
_base_ = ["gkgnet_coco_576.py"]

work_dir = "./work_dirs/gkgnet_b_coco_576"
model = dict(arch="b", drop_path=0.2)
data = dict(samples_per_device=8)  # wider model, halve per-chip batch
