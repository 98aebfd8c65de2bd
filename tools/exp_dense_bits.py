"""Time the dense building blocks standalone at production shapes to find
the 75 ms non-kernel remainder of the eval forward (two-point scan
timing). Also times one full Grapher and one GrapherLabel block."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gkgnet_tpu.nn.layers import ConvNorm, FFN, BasicConv, Stem
from gkgnet_tpu.nn.grapher import Grapher, GrapherLabel

B = 8
DT = jnp.bfloat16


def bench(apply_fn, variables, x, iters=20):
    @jax.jit
    def run(eps, v, xx):
        def body(c, e):
            return c + jnp.sum(apply_fn(v, xx + e).astype(jnp.float32)), None

        return jax.lax.scan(body, jnp.float32(0), eps)[0]

    def timed(n):
        eps = jnp.zeros((n,), x.dtype)
        np.asarray(run(eps, variables, x))
        t0 = time.perf_counter()
        np.asarray(run(eps, variables, x))
        return time.perf_counter() - t0

    return (timed(3 * iters) - timed(iters)) / (2 * iters)


def time_mod(name, mod, x, count, method=None):
    variables = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x, False))()
    fn = lambda v, xx: mod.apply(v, xx, False)
    t = bench(fn, variables, x)
    print(f"{name}: {t*1e3:7.3f} ms x{count} = {t*count*1e3:7.2f} ms",
          flush=True)
    return t * count


# (stage, H, C, blocks)
stages = [(1, 144, 80, 2), (2, 72, 160, 2), (3, 36, 400, 6), (4, 18, 640, 2)]
rng = np.random.default_rng(0)
total = 0.0

x0 = jnp.asarray(rng.standard_normal((B, 576, 576, 3)), DT)
total += time_mod("stem", Stem(80, act="gelu", dtype=DT), x0, 1)

for s, h, c, nb in stages:
    x = jnp.asarray(rng.standard_normal((B, h, h, c)), DT)
    total += time_mod(f"s{s} ConvNorm(fc1/fc2)",
                      ConvNorm(c, dtype=DT), x, 2 * nb)
    x2 = jnp.asarray(rng.standard_normal((B, h, h, 2 * c)), DT)
    total += time_mod(f"s{s} BasicConv(2C->2C, groups=4)",
                      BasicConv([2 * c, 2 * c], "gelu", "batch",
                                dtype=DT), x2, nb)
    total += time_mod(f"s{s} FFN", FFN(4 * c, c, "gelu", dtype=DT), x, nb)

print(f"\ndense-bits total (approx, excl. downsample/head): "
      f"{total*1e3:.2f} ms", flush=True)

# one full Grapher block (includes its fused kernel) for cross-checking
x = jnp.asarray(rng.standard_normal((B, 144, 144, 80)), DT)
g = Grapher(80, k=9, dilation=1, conv="mr", act="gelu", r=4,
            num_group=2, dtype=DT)
variables = jax.jit(lambda: g.init(jax.random.PRNGKey(0), x, None, False))()
t = bench(lambda v, xx: g.apply(v, xx, None, False), variables, x)
print(f"full stage1 Grapher block: {t*1e3:.2f} ms", flush=True)
