"""Model assembly: shapes, jit-ability, train-mode mutation, loss plumbing.

Uses a scaled-down geometry (size=128, k=3, 10 classes) so the 4-stage
pyramid + label pathway runs quickly on CPU while exercising every module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gkgnet_tpu.nn.classifier import GKGNetClassifier, parse_losses
from gkgnet_tpu.nn.gkgnet import GKGNet
from gkgnet_tpu.nn.grapher import Grapher, GrapherLabel, fold_groups, unfold_groups

SMALL = dict(arch="t", k=3, k_label_gcn=3, n_classes=10, size=128, drop_path=0.1)


@pytest.fixture(scope="module")
def model_and_vars():
    model = GKGNetClassifier(**SMALL)
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables


def test_fold_unfold_roundtrip():
    x = jnp.arange(2 * 5 * 8, dtype=jnp.float32).reshape(2, 5, 8)
    np.testing.assert_array_equal(
        np.asarray(unfold_groups(fold_groups(x, 4), 4)), np.asarray(x))
    # group i holds channel block i
    f = fold_groups(x, 2)
    np.testing.assert_array_equal(np.asarray(f[0]), np.asarray(x[0, :, :4]))
    np.testing.assert_array_equal(np.asarray(f[1]), np.asarray(x[0, :, 4:]))


def test_eval_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 128, 3)),
                    dtype=jnp.float32)
    score, edge = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert score.shape == (2, 10)
    assert np.isfinite(np.asarray(score)).all()
    # label edge idx: (B*num_group, n_classes, k_label)
    assert edge.shape == (4, 10, 3)


def test_train_forward_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 128, 128, 3)),
                    dtype=jnp.float32)
    (score, _), mutated = model.apply(
        variables, x, train=True,
        rngs={"droppath": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert score.shape == (2, 10)
    old = variables["batch_stats"]["backbone"]["stem"]["norm0"]["mean"]
    new = mutated["batch_stats"]["backbone"]["stem"]["norm0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_loss_and_parse(model_and_vars):
    model, variables = model_and_vars
    score = jnp.asarray(np.random.default_rng(2).standard_normal((2, 10)),
                        dtype=jnp.float32)
    gt = jnp.asarray((np.random.default_rng(3).random((2, 10)) < 0.3),
                     dtype=jnp.float32)
    losses = model.apply(variables, score, gt, method=model.loss)
    assert set(losses) == {"bce_loss", "asy_loss"}
    total, log_vars = parse_losses(losses)
    np.testing.assert_allclose(
        float(total), float(losses["bce_loss"] + losses["asy_loss"]), rtol=1e-6)
    assert "loss" in log_vars


def test_constants_collection_has_stage_tables(model_and_vars):
    _, variables = model_and_vars
    consts = variables["constants"]["backbone"]
    assert set(consts) == {f"rel_pos_stage{i}" for i in range(4)}
    # stage0: n=1024, r=4 -> (1024, 64)
    assert consts["rel_pos_stage0"].shape == (1024, 64)
    assert consts["rel_pos_stage3"].shape == (16, 16)


def test_grapher_all_aggregators():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 8, 8, 16)),
                    dtype=jnp.float32)
    for conv in ["mr", "edge", "sage", "gin", "gat"]:
        g = Grapher(16, k=4, dilation=1, conv=conv, act="gelu",
                    use_multi_group=(conv == "mr"), num_group=2)
        variables = g.init(jax.random.PRNGKey(0), x, None, False)
        y = g.apply(variables, x, None, False)
        assert y.shape == x.shape, conv
        assert np.isfinite(np.asarray(y)).all(), conv


def test_grapher_label_standalone():
    feats = jnp.asarray(np.random.default_rng(5).standard_normal((2, 8, 8, 16)),
                        dtype=jnp.float32)
    labels = jnp.asarray(np.random.default_rng(6).standard_normal((2, 10, 16)),
                         dtype=jnp.float32)
    gl = GrapherLabel(16, k=5, act="gelu", num_group=2)
    variables = gl.init(jax.random.PRNGKey(0), labels, feats, False)
    out, edge = gl.apply(variables, labels, feats, False)
    assert out.shape == (2, 10, 16)
    assert edge.shape == (4, 10, 5)
    assert int(edge.max()) < 64


def test_bf16_forward():
    model = GKGNetClassifier(dtype=jnp.bfloat16, **SMALL)
    x = jnp.zeros((1, 128, 128, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    score, _ = model.apply(variables, x, train=False)
    assert score.dtype == jnp.float32  # head computes in fp32
    # params stay fp32 master copies
    leaf = variables["params"]["backbone"]["stem"]["conv0"]["kernel"]
    assert leaf.dtype == jnp.float32
