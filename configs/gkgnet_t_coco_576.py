# GKGNet-T variant (arch 't': channels [48, 96, 240, 384], gkgnet.py:122-135)
# — same recipe as GKGNet-S.
_base_ = ["gkgnet_coco_576.py"]

work_dir = "./work_dirs/gkgnet_t_coco_576"
model = dict(arch="t")
