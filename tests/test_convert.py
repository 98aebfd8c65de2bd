"""Torch checkpoint conversion + functional parity against plain-torch
replicas of the reference blocks (eval mode, so no SyncBN dependence —
SURVEY §7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from gkgnet_tpu.nn.classifier import GKGNetClassifier
from gkgnet_tpu.nn.grapher import Grapher, GrapherLabel
from gkgnet_tpu.nn.layers import Stem
from gkgnet_tpu.utils.torch_convert import (
    convert_reference_checkpoint,
    expected_torch_shapes,
)

SMALL = dict(arch="t", k=3, k_label_gcn=3, n_classes=10, size=128)


@pytest.fixture(scope="module")
def converted():
    model = GKGNetClassifier(**SMALL)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    shapes = expected_torch_shapes(variables)
    g = torch.Generator().manual_seed(0)
    sd = {}
    for key, shp in shapes.items():
        if "running_var" in key or key.endswith("norm.weight") or ".1.weight" in key:
            sd[key] = torch.rand(shp, generator=g) * 0.5 + 0.75
        else:
            sd[key] = torch.randn(shp, generator=g) * 0.05
    new_vars = convert_reference_checkpoint(sd, variables)
    return model, variables, sd, new_vars


def test_conversion_covers_full_tree(converted):
    model, variables, sd, new_vars = converted
    flat_old = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_new = jax.tree_util.tree_leaves_with_path(new_vars["params"])
    assert len(flat_old) == len(flat_new)
    for (p_old, l_old), (p_new, l_new) in zip(sorted(flat_old, key=str),
                                              sorted(flat_new, key=str)):
        assert l_old.shape == l_new.shape, p_old


def test_grouped_conv_weight_roundtrip(converted):
    model, variables, sd, new_vars = converted
    w = sd["backbone.backbone.0.0.graph_conv.gconv.nn.0.weight"].numpy()
    k = np.asarray(new_vars["params"]["backbone"]["backbone_0_grapher"]
                   ["graph_conv"]["gconv"]["nn"]["conv0"]["kernel"])
    g, cout = 4, w.shape[0]
    np.testing.assert_allclose(
        k, w[:, :, 0, 0].reshape(g, cout // g, -1).transpose(0, 2, 1))


def make_torch_stem(c0, sd, prefix="backbone.stem.convs"):
    stem = nn.Sequential(
        nn.Conv2d(3, c0 // 2, 3, 2, 1), nn.BatchNorm2d(c0 // 2), nn.GELU(),
        nn.Conv2d(c0 // 2, c0, 3, 2, 1), nn.BatchNorm2d(c0), nn.GELU(),
        nn.Conv2d(c0, c0, 3, 1, 1), nn.BatchNorm2d(c0))
    state = {k[len(prefix) + 1:]: v for k, v in sd.items()
             if k.startswith(prefix)}
    stem.load_state_dict(state, strict=False)
    stem.eval()
    return stem


def test_stem_parity(converted):
    model, variables, sd, new_vars = converted
    c0 = 48
    tstem = make_torch_stem(c0, sd)
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tstem(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    stem = Stem(out_dim=c0, act="gelu")
    sub_vars = {"params": new_vars["params"]["backbone"]["stem"],
                "batch_stats": new_vars["batch_stats"]["backbone"]["stem"]}
    got = np.asarray(stem.apply(sub_vars, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)


def torch_grapher_forward(sd, prefix, x, k, num_group, r):
    """Plain-torch replica of the reference Grapher forward (eval mode,
    conv='mr', no relative_pos) — torch_vertex.py:325-333 + 191-205 +
    torch_edge.py:164-176 + torch_vertex.py:47-62."""

    def conv_bn(x, p):
        w, b = sd[f"{p}.0.weight"], sd[f"{p}.0.bias"]
        x = F.conv2d(x, w, b)
        return F.batch_norm(x, sd[f"{p}.1.running_mean"], sd[f"{p}.1.running_var"],
                            sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], False)

    shortcut = x
    x = conv_bn(x, f"{prefix}.fc1")
    B, C, H, W = x.shape
    y = None
    if r > 1:
        y = F.avg_pool2d(x, r, r).reshape(B, C, -1, 1)
    x = x.reshape(B, C, -1, 1)
    d = C // num_group
    xg = x.reshape(B * num_group, d, -1, 1)
    yg = y.reshape(B * num_group, d, -1, 1) if y is not None else xg

    xn = F.normalize(xg, p=2.0, dim=1)
    yn = F.normalize(yg, p=2.0, dim=1)
    xf = xn.squeeze(-1).transpose(2, 1)
    yf = yn.squeeze(-1).transpose(2, 1)
    dist = (xf * xf).sum(-1, keepdim=True) - 2 * xf @ yf.transpose(2, 1) \
        + (yf * yf).sum(-1, keepdim=True).transpose(2, 1)
    _, idx = torch.topk(-dist, k=k)

    bg, m = yg.shape[0], yg.shape[2]
    base = torch.arange(bg).view(-1, 1, 1) * m
    flat = (idx + base).reshape(-1)
    feat = yg.squeeze(-1).transpose(2, 1).reshape(bg * m, d)[flat]
    x_j = feat.view(bg, -1, k, d).permute(0, 3, 1, 2)
    x_i = xg.expand(-1, -1, -1, k)
    mr, _ = torch.max(x_j - x_i, -1, keepdim=True)
    mr = mr.reshape(B, C, -1, 1)
    xx = xg.reshape(B, C, -1, 1)
    h = torch.cat([xx.unsqueeze(2), mr.unsqueeze(2)], dim=2).reshape(B, 2 * C, -1, 1)

    p = f"{prefix}.graph_conv.gconv.nn"
    h = F.conv2d(h, sd[f"{p}.0.weight"], sd[f"{p}.0.bias"], groups=4)
    h = F.batch_norm(h, sd[f"{p}.1.running_mean"], sd[f"{p}.1.running_var"],
                     sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], False)
    h = F.gelu(h)
    h = h.reshape(B, 2 * C, H, W)
    h = conv_bn(h, f"{prefix}.fc2")
    return h + shortcut


def test_grapher_block_parity(converted):
    """End-to-end parity of one spatial Grapher block (the model's hot inner
    kernel) vs the torch replica, with converted weights."""
    model, variables, sd, new_vars = converted
    c0 = 48
    x = np.random.default_rng(1).standard_normal((2, 16, 16, c0)) \
        .astype(np.float32)
    want = torch_grapher_forward(
        sd, "backbone.backbone.0.0",
        torch.from_numpy(x.transpose(0, 3, 1, 2)), k=3, num_group=2, r=4,
    ).numpy()

    grapher = Grapher(c0, k=3, dilation=1, conv="mr", act="gelu", r=4,
                      use_multi_group=True, num_group=2)
    sub = {"params": new_vars["params"]["backbone"]["backbone_0_grapher"],
           "batch_stats":
               new_vars["batch_stats"]["backbone"]["backbone_0_grapher"]}
    got = np.asarray(grapher.apply(sub, jnp.asarray(x), None, False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)


def torch_grapher_label_forward(sd, prefix, labels, feats, k, num_group):
    """Plain-torch replica of GrapherLabel (torch_vertex.py:392-403 +
    266-275 + FFNLabel), eval mode."""

    def conv_bn(x, p):
        w, b = sd[f"{p}.0.weight"], sd[f"{p}.0.bias"]
        x = F.conv2d(x, w, b)
        return F.batch_norm(x, sd[f"{p}.1.running_mean"], sd[f"{p}.1.running_var"],
                            sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], False)

    B, C, H, W = feats.shape
    feats = feats.reshape(B, C, -1)
    x = labels.transpose(2, 1).unsqueeze(-1)     # (B, C, L, 1)
    shortcut = x
    x = conv_bn(x, f"{prefix}.fc1")
    L = x.shape[2]
    d = C // num_group
    xg = x.reshape(B * num_group, d, L, 1)
    yg = feats.reshape(B, C, -1, 1).reshape(B * num_group, d, -1, 1)

    xn = F.normalize(xg, p=2.0, dim=1).squeeze(-1).transpose(2, 1)
    yn = F.normalize(yg, p=2.0, dim=1).squeeze(-1).transpose(2, 1)
    dist = (xn * xn).sum(-1, keepdim=True) - 2 * xn @ yn.transpose(2, 1) \
        + (yn * yn).sum(-1, keepdim=True).transpose(2, 1)
    _, idx = torch.topk(-dist, k=k)

    bg, m = yg.shape[0], yg.shape[2]
    base = torch.arange(bg).view(-1, 1, 1) * m
    flat = (idx + base).reshape(-1)
    feat = yg.squeeze(-1).transpose(2, 1).reshape(bg * m, d)[flat]
    x_j = feat.view(bg, L, k, d).permute(0, 3, 1, 2)
    x_i = xg.expand(-1, -1, -1, k)
    mr, _ = torch.max(x_j - x_i, -1, keepdim=True)
    mr = mr.reshape(B, C, L, 1)
    xx = xg.reshape(B, C, L, 1)
    h = torch.cat([xx.unsqueeze(2), mr.unsqueeze(2)], dim=2).reshape(B, 2 * C, L, 1)

    p = f"{prefix}.graph_conv.gconv.nn"
    h = F.conv2d(h, sd[f"{p}.0.weight"], sd[f"{p}.0.bias"], groups=4)
    h = F.batch_norm(h, sd[f"{p}.1.running_mean"], sd[f"{p}.1.running_var"],
                     sd[f"{p}.1.weight"], sd[f"{p}.1.bias"], False)
    h = F.gelu(h)
    h = conv_bn(h, f"{prefix}.fc2")
    x = h + shortcut
    # FFNLabel: fc1 -> gelu -> fc2 + residual, then back to (B, L, C)
    sc = x
    x = conv_bn(x, f"{prefix}.ffn.fc1")
    x = F.gelu(x)
    x = conv_bn(x, f"{prefix}.ffn.fc2")
    x = x + sc
    return x.transpose(2, 1).squeeze(-1)


def test_grapher_label_parity(converted):
    model, variables, sd, new_vars = converted
    c0 = 48
    rngn = np.random.default_rng(7)
    labels = rngn.standard_normal((2, 10, c0)).astype(np.float32)
    feats = rngn.standard_normal((2, 16, 16, c0)).astype(np.float32)
    want = torch_grapher_label_forward(
        sd, "backbone.gcn_label.0.0",
        torch.from_numpy(labels),
        torch.from_numpy(feats.transpose(0, 3, 1, 2)), k=3, num_group=2,
    ).numpy()

    gl = GrapherLabel(c0, k=3, act="gelu", use_multi_group=True, num_group=2)
    sub = {"params": new_vars["params"]["backbone"]["gcn_label_0_0"],
           "batch_stats": new_vars["batch_stats"]["backbone"]["gcn_label_0_0"]}
    got, _ = gl.apply(sub, jnp.asarray(labels), jnp.asarray(feats), False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_downsample_and_ffn_parity(converted):
    model, variables, sd, new_vars = converted
    from gkgnet_tpu.nn.layers import Downsample, FFN

    rngn = np.random.default_rng(8)
    x = rngn.standard_normal((2, 16, 16, 48)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # Downsample backbone_2: conv3x3 s2 + BN (gkgnet.py:103-118)
    w = sd["backbone.backbone.2.conv.0.weight"]
    b = sd["backbone.backbone.2.conv.0.bias"]
    h = F.conv2d(xt, w, b, stride=2, padding=1)
    want = F.batch_norm(
        h, sd["backbone.backbone.2.conv.1.running_mean"],
        sd["backbone.backbone.2.conv.1.running_var"],
        sd["backbone.backbone.2.conv.1.weight"],
        sd["backbone.backbone.2.conv.1.bias"], False).numpy()
    ds = Downsample(96)
    sub = {"params": new_vars["params"]["backbone"]["backbone_2"],
           "batch_stats": new_vars["batch_stats"]["backbone"]["backbone_2"]}
    got = np.asarray(ds.apply(sub, jnp.asarray(x), False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)

    # FFN backbone_0 slot 1 (gkgnet.py:46-72)
    def conv_bn(x, p):
        h = F.conv2d(x, sd[f"{p}.0.weight"], sd[f"{p}.0.bias"])
        return F.batch_norm(h, sd[f"{p}.1.running_mean"],
                            sd[f"{p}.1.running_var"], sd[f"{p}.1.weight"],
                            sd[f"{p}.1.bias"], False)

    h = conv_bn(xt, "backbone.backbone.0.1.fc1")
    h = F.gelu(h)
    h = conv_bn(h, "backbone.backbone.0.1.fc2")
    want = (h + xt).numpy()
    ffn = FFN(48 * 4, 48, act="gelu")
    sub = {"params": new_vars["params"]["backbone"]["backbone_0_ffn"],
           "batch_stats": new_vars["batch_stats"]["backbone"]["backbone_0_ffn"]}
    got = np.asarray(ffn.apply(sub, jnp.asarray(x), False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=2e-3)


def test_head_score_parity(converted):
    model, variables, sd, new_vars = converted
    rng = np.random.default_rng(2)
    label_emb = rng.standard_normal((2, 10, 384)).astype(np.float32)
    gap = rng.standard_normal((2, 384)).astype(np.float32)

    w1, b1 = sd["head.fc1.weight"], sd["head.fc1.bias"]
    w2, b2 = sd["head.fc2.weight"], sd["head.fc2.bias"]
    le = torch.from_numpy(label_emb)
    out1 = le @ w1.T + b1
    diag = torch.eye(10).unsqueeze(0).repeat(2, 1, 1)
    score1 = (out1 * diag).sum(-1)
    score2 = torch.from_numpy(gap) @ w2.T + b2
    want = (score1 + score2).numpy()

    from gkgnet_tpu.nn.heads import LabelQueryHead
    head = LabelQueryHead(num_classes=10, in_channels=384)
    sub = {"params": new_vars["params"]["head"]}
    got = np.asarray(head.apply(sub, jnp.asarray(label_emb), jnp.asarray(gap)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_released_checkpoint_container_576_cli(tmp_path):
    """VERDICT r4 #8: keep the released-.pth.tar import path warm at the
    flagship geometry. Synthesizes a FULL GKGNet-S @576 classifier
    state_dict (every key the reference checkpoint carries, exact shapes
    from expected_torch_shapes), wraps it in the reference's checkpoint
    container (torch.save {'state_dict', 'meta'} with DDP 'module.'
    prefixes, mmcv CheckpointHook format — README.md:52-60 /
    gkgnet_coco_576.py:19-24 name the real files), and drives the
    tools/convert_models/torch2jax.py CLI end-to-end: load -> strip ->
    map -> orbax save. Asserts a zero-missing/zero-unused report and
    that the saved orbax params reload."""
    import os
    import subprocess
    import sys

    model = GKGNetClassifier(arch="s", k=9, k_label_gcn=9, n_classes=80,
                             size=576)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 576, 576, 3)), train=False))
    shapes = expected_torch_shapes(variables)
    g = torch.Generator().manual_seed(0)
    sd = {}
    for key, shp in shapes.items():
        if "running_var" in key or key.endswith("norm.weight"):
            sd[key] = torch.rand(shp, generator=g) * 0.5 + 0.75
        else:
            sd[key] = torch.randn(shp, generator=g) * 0.05
    container = {
        "state_dict": {"module." + k: v for k, v in sd.items()},
        "meta": {"epoch": 80, "iter": 123456,
                 "CLASSES": [f"c{i}" for i in range(80)]},
    }
    pth = tmp_path / "gkgnet_coco_576_synth.pth.tar"
    torch.save(container, str(pth))

    out_dir = tmp_path / "converted"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/convert_models/torch2jax.py"),
         str(pth), os.path.join(repo, "configs/gkgnet_coco_576.py"),
         str(out_dir)],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    # strict (non --partial) conversion RAISES on any missing/mis-shaped
    # key, so rc == 0 is the full-coverage guarantee
    assert res.returncode == 0, res.stdout + res.stderr
    assert "converted ->" in res.stdout, res.stdout[-2000:]

    from gkgnet_tpu.core.checkpoint import restore_checkpoint

    restored, _epoch, _meta = restore_checkpoint(str(out_dir))
    stem_kernel = restored["params"]["backbone"]["stem"]["conv0"]["kernel"]
    want = sd["backbone.stem.convs.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(stem_kernel), want, atol=1e-6)
