"""Device mesh + sharding helpers.

The framework's parallel dimensions (replacing the reference's
NCCL-DDP-only design, SURVEY §2.8):

  * ``data``  — batch (DP). Gradient psum is fused into the pjit backward;
    BatchNorm moments reduce globally over the sharded batch axis = SyncBN.
  * ``graph`` — node/edge partition (the graph-domain analog of sequence
    parallelism): the k-NN query axis is sharded, the (small, pooled)
    target sets replicate via XLA all-gather over ICI, and each shard
    top-ks its own queries. See parallel/sharding.py.

Multi-host: ``jax.distributed.initialize`` + the same mesh over all
processes; the data axis should span hosts (DCN) and the graph axis should
stay within a slice (ICI) — ``make_mesh`` orders axes accordingly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, graph: int = 1, devices=None) -> Mesh:
    """Build a (data, graph) mesh. ``data=None`` -> all remaining devices.
    Axis order (data, graph) keeps graph-axis neighbors closest on ICI."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % graph == 0, (n, graph)
        data = n // graph
    assert data * graph == n, f"mesh {data}x{graph} != {n} devices"
    arr = np.array(devices).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch axis over 'data'.

    Multi-host: each process passes its *local* shard; the global array is
    assembled across processes (the data axis must span hosts in loader
    order — build_dataloader's rank sharding provides rank r the rows of
    global indices r::world, matching the mesh's process order)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState (params/opt/stats) across the mesh."""
    rep = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
