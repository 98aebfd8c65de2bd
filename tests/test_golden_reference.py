"""Golden parity against the REAL reference modules (not replicas).

Loads /root/reference/mmcls model code through tests/ref_loader.py (timm/
mmcv shims only — the model math is the reference's own), converts the torch
state_dict with gkgnet_tpu.utils.torch_convert, and asserts this framework
produces the same numbers in eval mode (VERDICT round-1 item 1a).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gkgnet_tpu.nn.gkgnet import GKGNet
from gkgnet_tpu.ops.knn import knn_graph, l2_normalize
from gkgnet_tpu.ops.pos_embed import get_relative_pos_table
from gkgnet_tpu.utils.torch_convert import convert_reference_checkpoint

from ref_loader import load_reference

SMALL = dict(k=3, k_label_gcn=3, n_classes=10, size=128)


def _assert_close_scaled(got, want, tol=1e-4):
    scale = float(np.max(np.abs(want))) or 1.0
    diff = float(np.max(np.abs(got - want)))
    assert diff <= tol * scale, (
        f"max |diff|={diff:g} exceeds {tol:g} x scale ({scale:g})")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def golden_pair(ref):
    """(torch reference GKGNet-T, our GKGNet-T with converted weights)."""
    torch.manual_seed(0)
    tm = ref["gkgnet"].GKGNet(choice="t", **SMALL)
    # randomize BN running stats so eval-mode normalization is non-trivial
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) * 0.5 + 0.75)
        tm.pos_embed.copy_(torch.randn(tm.pos_embed.shape, generator=g) * 0.02)
    tm.eval()

    jm = GKGNet(arch="t", **SMALL)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)), train=False)
    sd = {"backbone." + k: v for k, v in tm.state_dict().items()}
    wrapped = {c: {"backbone": variables[c]} for c in ("params", "batch_stats")}
    conv = convert_reference_checkpoint(sd, wrapped)
    new_vars = dict(variables)
    new_vars["params"] = conv["params"]["backbone"]
    new_vars["batch_stats"] = conv["batch_stats"]["backbone"]
    return tm, jm, new_vars


def test_real_dense_knn_matrix_parity(ref):
    te = ref["torch_edge"]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 100, 1)).astype(np.float32)  # (B,C,N,1)
    k = 7
    edge = te.dense_knn_matrix(torch.from_numpy(x), k=k)  # (2, B, N, k)
    want = edge[0].numpy()  # neighbor indices

    xj = jnp.asarray(x[:, :, :, 0].transpose(0, 2, 1))  # (B, N, C)
    got = np.asarray(knn_graph(xj, None, k=k, normalize=False))
    # same distance -> same neighbor *sets*; tie order may differ
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))
    # and with continuous random data the order matches too
    np.testing.assert_array_equal(got, want)


def test_real_xy_dense_knn_matrix_parity(ref):
    te = ref["torch_edge"]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 10, 1)).astype(np.float32)
    y = rng.standard_normal((2, 12, 50, 1)).astype(np.float32)
    k = 5
    edge = te.xy_dense_knn_matrix(torch.from_numpy(x), torch.from_numpy(y), k=k)
    want = edge[0].numpy()
    xj = jnp.asarray(x[:, :, :, 0].transpose(0, 2, 1))
    yj = jnp.asarray(y[:, :, :, 0].transpose(0, 2, 1))
    got = np.asarray(knn_graph(xj, yj, k=k, normalize=False))
    np.testing.assert_array_equal(got, want)


def test_real_knn_graph_module_normalization(ref):
    """DenseDilatedKnnGraph normalizes features before the distance
    (torch_edge.py:166-175); verify against our l2_normalize + knn_graph."""
    te = ref["torch_edge"]
    mod = te.DenseDilatedKnnGraph(k=4, dilation=1, stochastic=False, epsilon=0.0)
    mod.eval()
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 8, 60, 1)) * 3).astype(np.float32)
    with torch.no_grad():
        edge = mod(torch.from_numpy(x))
    want = edge[0].numpy()
    xj = jnp.asarray(x[:, :, :, 0].transpose(0, 2, 1))
    got = np.asarray(knn_graph(xj, None, k=4, normalize=True))
    np.testing.assert_array_equal(got, want)


def test_real_relative_pos_table_parity(ref):
    """Grapher's bicubic-resized negated sincos table (torch_vertex.py:308-323)
    vs our fused P(WP)^T form."""
    tv = ref["torch_vertex"]
    m = tv.Grapher(in_channels=32, kernel_size=3, dilation=1, conv="mr",
                   act="gelu", norm="batch", bias=True, stochastic=False,
                   epsilon=0.0, r=2, n=64, drop_path=0.0, relative_pos=True,
                   use_multi_group=True, num_group=2)
    want = m.relative_pos.detach().numpy()[0]  # (n, n/r^2)
    got = np.asarray(get_relative_pos_table(32, 64, 2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_real_gkgnet_full_forward_parity(golden_pair):
    """End-to-end eval forward of the REAL reference GKGNet vs ours with
    converted weights: label embeddings, GAP features, and the final
    label->patch edge set."""
    tm, jm, variables = golden_pair
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_label, t_gap, t_edge = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_label, j_gap, j_edge = jax.jit(
        lambda v, xx: jm.apply(v, xx, train=False))(variables, jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(j_edge), t_edge.numpy())
    # random-init kaiming weights blow activations up to ~1e7, where
    # per-element rtol is dominated by fp32 cancellation noise; compare
    # against the tensor scale instead (1e-4 of max |value|)
    _assert_close_scaled(np.asarray(j_gap), t_gap.numpy())
    _assert_close_scaled(np.asarray(j_label), t_label.numpy())


def test_partial_backbone_only_import(golden_pair):
    """pvig_s-style backbone bootstrap: the ImageNet checkpoint covers only
    the spatial pathway (stem/backbone/pos_embed) — the reference loads it
    with non-strict semantics (gkgnet.py:255-261). Partial conversion must
    fill those subtrees, keep the label pathway at template init, and
    report exactly what happened."""
    tm, jm, _ = golden_pair
    variables = jm.init(jax.random.PRNGKey(7),
                        jnp.zeros((1, 128, 128, 3)), train=False)
    # simulate a pvig_s state_dict: spatial-only keys (+ an ImageNet head
    # the converter must report as unused)
    sd = {"backbone." + k: v for k, v in tm.state_dict().items()
          if k.startswith(("stem.", "backbone.", "pos_embed"))}
    sd["backbone.prediction.0.weight"] = torch.zeros(1024, 384, 1, 1)
    wrapped = {c: {"backbone": variables[c]} for c in ("params", "batch_stats")}

    with pytest.raises(Exception):  # strict mode must refuse a partial dict
        convert_reference_checkpoint(sd, wrapped, strict=True)

    report: dict = {}
    conv = convert_reference_checkpoint(sd, wrapped, strict=False,
                                        report=report)
    assert report["unused"] == ["backbone.prediction.0.weight"]
    assert not report["mismatched"]
    assert all(".gcn_label." in k or ".ffn_label." in k or "label_lt" in k
               for k in report["missing"]), report["missing"][:5]
    assert any("label_lt" in k for k in report["missing"])

    new_p, old_p = conv["params"]["backbone"], variables["params"]
    # spatial weights came from torch ...
    np.testing.assert_allclose(
        new_p["stem"]["conv0"]["kernel"],
        np.asarray(tm.state_dict()["stem.convs.0.weight"]).transpose(2, 3, 1, 0))
    assert not np.allclose(new_p["stem"]["conv0"]["kernel"],
                           np.asarray(old_p["stem"]["conv0"]["kernel"]))
    # ... label pathway kept its fresh init
    np.testing.assert_array_equal(
        new_p["label_lt"]["embedding"], np.asarray(old_p["label_lt"]["embedding"]))
    # tree structure unchanged (jit-compatible with the template)
    assert (jax.tree_util.tree_structure(conv["params"])
            == jax.tree_util.tree_structure(wrapped["params"]))


def test_real_gkgnet_stem_stage1_parity(golden_pair):
    """Tap the first Grapher+FFN output of the real model and compare —
    catches block-level drift the end-to-end tolerance could hide."""
    tm, jm, variables = golden_pair
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        h = tm.stem(torch.from_numpy(x.transpose(0, 3, 1, 2))) + tm.pos_embed
        want = tm.backbone[0](h).numpy()  # Grapher+FFN block 0

    def run(v, xx):
        _, intermediates = jm.apply(v, xx, train=False,
                                    capture_intermediates=True)
        return intermediates

    inter = jax.jit(run)(variables, jnp.asarray(x))
    got = np.asarray(
        inter["intermediates"]["backbone_0_ffn"]["__call__"][0])
    _assert_close_scaled(got.transpose(0, 3, 1, 2), want)
