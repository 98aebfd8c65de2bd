from gkgnet_tpu.ops.pallas.knn_topk import knn_topk
