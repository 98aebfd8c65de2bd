from gkgnet_tpu.data.coco import CocoMultiLabel, COCO_CLASSES
from gkgnet_tpu.data.wrappers import (
    ClassBalancedDataset,
    ConcatDataset,
    KFoldDataset,
    RepeatDataset,
)
from gkgnet_tpu.data.samplers import (
    DistributedSampler,
    IdInOrderSampler,
    RepeatAugSampler,
)
from gkgnet_tpu.data.loader import DataLoader, build_dataloader
from gkgnet_tpu.data import pipelines
