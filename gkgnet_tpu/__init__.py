"""gkgnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-label Vision-GNN framework.

Re-designed from scratch with the capabilities of GKGNet (ECCV 2024,
"Group K-Nearest Neighbor based Graph Convolutional Network for Multi-Label
Image Recognition"; reference implementation jin-s13/GKGNet).

Layout conventions (TPU-first, unlike the reference's torch NCHW):
  * images / feature maps:  NHWC   (lane dim = channels, MXU/VPU friendly)
  * node sets:              (B, N, C)  channel-last
  * edge indices:           (B, N, k) int32 neighbor ids (centers implicit)
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoid importing flax for ops-only users
    if name == "GKGNet":
        from gkgnet_tpu.nn.gkgnet import GKGNet
        return GKGNet
    if name == "GKGNetClassifier":
        from gkgnet_tpu.nn.classifier import GKGNetClassifier
        return GKGNetClassifier
    raise AttributeError(name)
