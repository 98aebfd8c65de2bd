from gkgnet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
)
from gkgnet_tpu.parallel.sharding import graph_sharding, shard_nodes
