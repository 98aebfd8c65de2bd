from gkgnet_tpu.ops.knn import (
    l2_normalize,
    pairwise_sqdist,
    knn_graph,
    dilate_edges,
)
from gkgnet_tpu.ops.aggregate import (
    gather_nodes,
    max_relative,
)
from gkgnet_tpu.ops.pos_embed import (
    get_2d_sincos_pos_embed,
    get_relative_pos_table,
)
from gkgnet_tpu.ops.interpolate import resize_bicubic_torch
