#!/usr/bin/env python
"""Edge-build scaling benchmark: edges/s of the distributed kNN+aggregate
across mesh sizes (the SURVEY north-star ">=85% scaling efficiency 1->N"
measurement). On real multi-chip hardware the graph axis rides ICI; on CPU
(--force-cpu N) it validates functionality and gives a软 scaling signal."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--force-cpu", type=int, default=0,
                   help="use N virtual CPU devices")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--n", type=int, default=20736, help="query nodes")
    p.add_argument("--m", type=int, default=1296, help="target nodes")
    p.add_argument("--dim", type=int, default=40)
    p.add_argument("--k", type=int, default=9)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    if args.force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.force_cpu}"
        ).strip()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from gkgnet_tpu.utils.env import apply_env_platform

        apply_env_platform()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gkgnet_tpu.parallel.edge_partition import edge_partitioned_knn_mr
    from gkgnet_tpu.parallel.mesh import make_mesh

    n_dev = jax.device_count()
    rng = np.random.default_rng(0)
    bg = args.batch * 2  # 2 feature groups
    x = jnp.asarray(rng.standard_normal((bg, args.n, args.dim)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((bg, args.m, args.dim)), jnp.float32)
    edges = bg * args.n * args.k

    results = []
    g = 1
    while g <= n_dev:
        if args.n % g or args.m % g or n_dev % g:
            g *= 2
            continue
        mesh = make_mesh(data=1, graph=g,
                         devices=jax.devices()[:g])
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "graph", None)))
        ys = jax.device_put(y, NamedSharding(mesh, P(None, "graph", None)))
        fn = jax.jit(lambda a, b, mesh=mesh: edge_partitioned_knn_mr(
            mesh, a, b, None, k=args.k))
        idx, mr = fn(xs, ys)
        np.asarray(idx)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            idx, mr = fn(xs, ys)
        np.asarray(idx)
        dt = (time.perf_counter() - t0) / args.iters
        eps = edges / dt
        results.append({"graph_shards": g, "ms": round(dt * 1e3, 2),
                        "edges_per_sec": round(eps)})
        g *= 2

    base = results[0]["edges_per_sec"] if results else 1
    for r in results:
        r["scaling_efficiency"] = round(
            r["edges_per_sec"] / (base * r["graph_shards"]), 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
