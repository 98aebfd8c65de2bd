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


_BARRIER_SEQ = [0]


def sync_processes(tag: str, timeout_ms: int = 600_000, block_on=None):
    """Line processes up on the COORDINATION-SERVICE barrier (not a
    device collective). The CPU gloo backend gives a fresh communicator
    only ~30 s to form; when ranks drift apart (multi-minute jit compiles
    under host contention, or a runtime still draining async work from
    the previous program), the first collective dispatch of a new
    program times out fatally. Pass ``block_on`` (any pytree of arrays,
    e.g. the train state) to drain outstanding device work first — the
    python barrier alone does not synchronize device streams. No-op when
    jax.distributed is not initialized."""
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
    except Exception:  # pragma: no cover
        client = None
    if client is None:
        return
    if block_on is not None:
        jax.block_until_ready(block_on)
    _BARRIER_SEQ[0] += 1
    client.wait_at_barrier(f"gkgnet_{tag}_{_BARRIER_SEQ[0]}", timeout_ms)


def local_batch_rows(arr) -> np.ndarray:
    """THIS process's rows of a batch-sharded global array, in global
    order. Multi-host jit outputs span non-addressable devices, so a
    plain ``np.asarray`` raises; each process instead collects its
    addressable shards (deduped when replicated along other mesh axes)
    and concatenates them by batch offset — recovering exactly the rows
    of its own loader shard."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    by_start: dict = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate(
        [by_start[k] for k in sorted(by_start)], axis=0)


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
