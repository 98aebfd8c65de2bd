from gkgnet_tpu.nn.layers import (
    Activation,
    BatchNorm,
    BasicConv,
    DropPath,
    Downsample,
    FFN,
    PointwiseConv,
    Stem,
)
from gkgnet_tpu.nn.grapher import Grapher, GrapherLabel
from gkgnet_tpu.nn.gkgnet import GKGNet
from gkgnet_tpu.nn.heads import LabelQueryHead, LinearClsHead, MultiLabelLinearClsHead
from gkgnet_tpu.nn.classifier import GKGNetClassifier
