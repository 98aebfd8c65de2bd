#!/usr/bin/env python
"""Localize the 576^2 golden-parity divergence (test_golden_full_scale):
compare per-backbone-block activations of the real reference torch model
vs this framework with converted weights, printing the first block where
they diverge beyond near-tie noise."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# exact fp32 (XLA:CPU default-precision convs are bf16-sloppy on this
# host; see tests/conftest.py)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
import torch

from gkgnet_tpu.nn.gkgnet import GKGNet
from gkgnet_tpu.utils.torch_convert import convert_reference_checkpoint

from ref_loader import load_reference

SIZE = int(__import__("os").environ.get("DBG_SIZE", "576"))
FULL = dict(k=9, k_label_gcn=9, n_classes=80, size=SIZE, drop_path=0.0)


def rel_err(a, b):
    scale = float(np.max(np.abs(b))) or 1.0
    return float(np.max(np.abs(a - b))) / scale


def main():
    ref = load_reference()
    torch.manual_seed(0)
    tm = ref["gkgnet"].GKGNet(choice="s", **FULL)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        tm.pos_embed.copy_(torch.randn(tm.pos_embed.shape, generator=g) * 0.02)
    for m in tm.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.momentum = 1.0
    cal = torch.from_numpy(
        np.random.default_rng(5).standard_normal(
            (1, 3, SIZE, SIZE)).astype(np.float32))
    tm.train()
    with torch.no_grad():
        tm(cal)
    tm.eval()

    jm = GKGNet(arch="s", **FULL)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    sd = {"backbone." + k: v for k, v in tm.state_dict().items()}
    wrapped = {c: {"backbone": variables[c]}
               for c in ("params", "batch_stats")}
    conv = convert_reference_checkpoint(sd, wrapped)
    new_vars = dict(variables)
    new_vars["params"] = conv["params"]["backbone"]
    new_vars["batch_stats"] = conv["batch_stats"]["backbone"]

    # torch intermediates: stem out and every backbone block out (NCHW)
    caps = {}

    def mk_hook(name):
        def h(mod, inp, out):
            caps[name] = out.detach()
        return h

    tm.stem.register_forward_hook(mk_hook("stem"))
    for i, blk in enumerate(tm.backbone):
        blk.register_forward_hook(mk_hook(f"bb{i}"))
    for j in range(len(tm.gcn_label)):
        tm.gcn_label[j].register_forward_hook(mk_hook(f"lab{j}"))

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, SIZE, SIZE, 3)).astype(np.float32)
    with torch.no_grad():
        t_label, t_gap, t_edge = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    # jax intermediates via flax capture
    out, state = jm.apply(new_vars, jnp.asarray(x), train=False,
                          capture_intermediates=True,
                          mutable=["intermediates"])
    inter = state["intermediates"]

    def get(path):
        d = inter
        for part in path.split("/"):
            d = d[part]
        v = d["__call__"]
        return v[0] if isinstance(v, tuple) else v

    def to_nhwc(t):
        return t.numpy().transpose(0, 2, 3, 1)

    print("stem rel err:",
          rel_err(np.asarray(get("stem")), to_nhwc(caps["stem"])))
    for i in range(15):
        if f"backbone_{i}_ffn" in inter:
            jv = np.asarray(get(f"backbone_{i}_ffn"))
        else:
            jv = np.asarray(get(f"backbone_{i}"))
        tv = to_nhwc(caps[f"bb{i}"])
        if jv.shape != tv.shape:
            jv = jv.reshape(tv.shape)
        print(f"bb{i} rel err: {rel_err(jv, tv):.6f}  shape={tv.shape}")
    for j in range(0):
        te = caps[f"lab{j}"]
        te = te[0] if isinstance(te, (tuple, list)) else te
        jv = get(f"gcn_label_{j}_0")
        jv = np.asarray(jv[0] if isinstance(jv, (tuple, list)) else jv)
        tv = te.numpy()
        if tv.ndim == 4:
            tv = tv.squeeze(-1).transpose(0, 2, 1)
        if jv.shape != tv.shape:
            jv = jv.reshape(tv.shape)
        print(f"lab{j} rel err: {rel_err(jv, tv):.6f}  shape={tv.shape}")

    print("j_gap rel err:", rel_err(np.asarray(out[1]), t_gap.numpy()))


if __name__ == "__main__":
    main()
