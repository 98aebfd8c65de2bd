"""Localize the composition gap: full model vs backbone vs stage-1 chain
vs label tap, two-point scan timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from gkgnet_tpu.nn.gkgnet import GKGNet
from gkgnet_tpu.nn.grapher import Grapher, GrapherLabel
from gkgnet_tpu.nn.layers import FFN, Stem
from gkgnet_tpu.nn.classifier import GKGNetClassifier

B = 8
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def bench(apply_fn, variables, x, iters=20):
    @jax.jit
    def run(eps, v, xx):
        def body(c, e):
            out = apply_fn(v, xx + e)
            return c + jnp.sum(jax.tree.leaves(out)[0].astype(
                jnp.float32)), None

        return jax.lax.scan(body, jnp.float32(0), eps)[0]

    def timed(n):
        eps = jnp.zeros((n,), x.dtype)
        np.asarray(run(eps, variables, x))
        t0 = time.perf_counter()
        np.asarray(run(eps, variables, x))
        return time.perf_counter() - t0

    return (timed(3 * iters) - timed(iters)) / (2 * iters)


class Stage1Chain(nn.Module):
    """stem + pos-embed-less stage-1: (Grapher + FFN) x2 — exactly the
    model's first stage composition."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Stem(80, act="gelu", dtype=DT, name="stem")(x, train)
        for i in range(2):
            x = Grapher(80, k=9, dilation=1, conv="mr", act="gelu", r=4,
                        num_group=2, dtype=DT, name=f"g{i}")(x, None, train)
            x = FFN(320, 80, "gelu", dtype=DT, name=f"f{i}")(x, train)
        return x


x0 = jnp.asarray(rng.standard_normal((B, 576, 576, 3)), DT)

chain = Stage1Chain()
v = jax.jit(lambda: chain.init(jax.random.PRNGKey(0), x0))()
t = bench(lambda vv, xx: chain.apply(vv, xx), v, x0)
print(f"stage1 chain (stem + 2x(Grapher+FFN)): {t*1e3:.2f} ms", flush=True)

feats = jnp.asarray(rng.standard_normal((B, 144, 144, 80)), DT)
labels = jnp.asarray(rng.standard_normal((B, 80, 80)), DT)
gl = GrapherLabel(80, k=9, conv="mr", act="gelu", num_group=2, dtype=DT)
v = jax.jit(lambda: gl.init(jax.random.PRNGKey(0), labels, feats, False))()
t = bench(lambda vv, ll: gl.apply(vv, ll, feats, False)[0], v, labels)
print(f"stage1 GrapherLabel tap: {t*1e3:.2f} ms", flush=True)

bb = GKGNet(arch="s", k=9, k_label_gcn=9, n_classes=80, size=576, dtype=DT)
v = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), x0, train=False))()
t = bench(lambda vv, xx: bb.apply(vv, xx, train=False), v, x0)
print(f"GKGNet backbone forward: {t*1e3:.2f} ms", flush=True)

model = GKGNetClassifier(arch="s", n_classes=80, size=576, dtype=DT)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x0))()
t = bench(lambda vv, xx: model.apply(vv, xx, train=False)[0], v, x0)
print(f"full classifier forward: {t*1e3:.2f} ms", flush=True)
