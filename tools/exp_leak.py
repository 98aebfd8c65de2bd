#!/usr/bin/env python
"""Diagnose the per-step host-RSS growth that OOM-killed the 60-epoch
training runs at ~epoch 30 (129 GB anon-rss, exactly ~one fp32 input
batch per step: 8x576x576x3x4 B = 31.9 MB x 3840 steps).

Repro candidates, each 64 iterations of a fresh 32 MB host->device
transfer with the reference dropped immediately:
  a) plain jax.device_put (the shard_batch path)
  b) device_put + a jitted consume (mimics train_step usage)
  c) b + explicit old-array .delete()
RSS is sampled from /proc/self/statm every 8 iters.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") // 2**20


def main():
    import gkgnet_tpu  # noqa: F401  (compile cache setup)
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print("device:", dev, "rss0:", rss_mb(), "MB", flush=True)
    shape = (8, 576, 576, 3)  # fp32 = 31.9 MB, the train batch

    @jax.jit
    def consume(x):
        return jnp.float32(x).sum()

    rng = np.random.default_rng(0)
    base = rng.standard_normal(shape).astype(np.float32)

    # d) staging-buffer reuse: ONE persistent host array, refilled in
    # place each iter — probes whether the plugin's retained copy is
    # keyed by buffer identity (fix: stage collated batches) or per call.
    staging = np.empty(shape, np.float32)
    start = rss_mb()
    for i in range(64):
        np.copyto(staging, base + np.float32(i))
        arr = jax.device_put(staging, dev)
        consume(arr).block_until_ready()
        if (i + 1) % 16 == 0:
            print(f"  staged_reuse: iter {i+1:3d} rss {rss_mb()} MB "
                  f"(+{rss_mb() - start})", flush=True)
    print(f"staged_reuse: net {rss_mb() - start} MB", flush=True)

    # e) uint8 transfer (the device-normalize path): leak scale check
    base8 = (np.clip(base, -3, 3) * 40 + 128).astype(np.uint8)
    start = rss_mb()
    for i in range(64):
        host = base8.copy()
        arr = jax.device_put(host, dev)
        consume(arr).block_until_ready()
        if (i + 1) % 32 == 0:
            print(f"  uint8: iter {i+1:3d} rss {rss_mb()} MB "
                  f"(+{rss_mb() - start})", flush=True)
    print(f"uint8: net {rss_mb() - start} MB over 64 x 8 MB", flush=True)
    return

    for mode in ("put_only", "put_consume", "put_consume_delete"):
        start = rss_mb()
        prev = None
        for i in range(64):
            host = base + np.float32(i)          # fresh host buffer
            arr = jax.device_put(host, dev)
            if mode != "put_only":
                s = consume(arr)
                s.block_until_ready()
            if mode == "put_consume_delete" and prev is not None:
                prev.delete()
            prev = arr
            if (i + 1) % 16 == 0:
                print(f"  {mode}: iter {i+1:3d} rss {rss_mb()} MB "
                      f"(+{rss_mb() - start})", flush=True)
        del prev
        import gc
        gc.collect()
        print(f"{mode}: net {rss_mb() - start} MB over 64 x 31.9 MB "
              f"transfers", flush=True)


if __name__ == "__main__":
    main()
