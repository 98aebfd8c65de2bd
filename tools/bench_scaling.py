#!/usr/bin/env python
"""Edge-build scaling benchmark: edges/s of the distributed kNN+aggregate
across mesh sizes (the SURVEY north-star ">=85% scaling efficiency 1->N"
measurement), for both edge-partition schedules (all_gather vs the
ppermute ring that overlaps the ICI transfer with local selection).

Timing is an on-device lax.scan with a runtime epsilon — one dispatch per
measurement (docs/PERF.md measurement methodology; the round-2 version
used a host-side dispatch loop, the exact trap PERF.md documents).

On real multi-chip hardware the graph axis rides ICI; on CPU
(--force-cpu N) it validates functionality and gives a coarse scaling
signal (the virtual devices share the host's cores, so CPU "efficiency"
understates the hardware number). Use --json PATH to write the results.
"""

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
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--json", default=None, help="write results to this path")
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

    def bench(fn, xs, ys):
        # on-device iteration: one dispatch per measurement; the epsilon is
        # a runtime argument so nothing is loop-invariant
        @jax.jit
        def run(eps, a, b):
            def body(c, e):
                idx, mr = fn(a + e, b)
                return (c + jnp.sum(idx).astype(jnp.float32)
                        + jnp.sum(mr).astype(jnp.float32)), None

            return jax.lax.scan(body, jnp.float32(0), eps)[0]

        eps = jnp.zeros((args.iters,), xs.dtype)
        np.asarray(run(eps, xs, ys))
        t0 = time.perf_counter()
        np.asarray(run(eps, xs, ys))
        return (time.perf_counter() - t0) / args.iters

    results = []
    g = 1
    while g <= n_dev:
        if args.n % g or args.m % g or n_dev % g:
            g *= 2
            continue
        mesh = make_mesh(data=1, graph=g, devices=jax.devices()[:g])
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "graph", None)))
        ys = jax.device_put(y, NamedSharding(mesh, P(None, "graph", None)))
        row = {"graph_shards": g}
        for overlap in (False, True):
            fn = lambda a, b, mesh=mesh, ov=overlap: edge_partitioned_knn_mr(
                mesh, a, b, None, k=args.k, overlap=ov)
            dt = bench(fn, xs, ys)
            tag = "ring" if overlap else "gather"
            row[f"ms_{tag}"] = round(dt * 1e3, 2)
            row[f"edges_per_sec_{tag}"] = round(edges / dt)
        results.append(row)
        g *= 2

    base = results[0]["edges_per_sec_ring"] if results else 1
    for r in results:
        r["scaling_efficiency_ring"] = round(
            r["edges_per_sec_ring"] / (base * r["graph_shards"]), 3)
        r["ring_vs_gather"] = round(
            r["edges_per_sec_ring"] / max(r["edges_per_sec_gather"], 1), 3)
    out = {"config": {"batch": args.batch, "n": args.n, "m": args.m,
                      "dim": args.dim, "k": args.k,
                      "backend": jax.default_backend(),
                      "devices": n_dev},
           "results": results}
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
