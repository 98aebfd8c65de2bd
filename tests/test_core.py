"""Training-core tests: metrics vs sklearn, schedules, optimizer masks,
config merge, and a 2-step end-to-end train smoke on the small model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gkgnet_tpu.core import metrics as M
from gkgnet_tpu.core.config import Config
from gkgnet_tpu.core.optim import build_optimizer, no_decay_mask
from gkgnet_tpu.core.schedules import step_lr_with_warmup
from gkgnet_tpu.core.trainer import (
    create_train_state, make_eval_step, make_train_step,
)
from gkgnet_tpu.nn.classifier import GKGNetClassifier


# ------------------------------------------------------------------ metrics

def test_coco_metrics_against_sklearn():
    from sklearn import metrics as skm

    rng = np.random.default_rng(0)
    target = (rng.random((50, 8)) < 0.3).astype(np.float64)
    target[:, 3] = 1  # ensure no empty class
    pred = rng.random((50, 8))
    got = M.coco_metrics(target, pred)

    binary = (pred >= 0.5).astype(np.float64)
    want_cp = skm.precision_score(target, binary, average="macro", zero_division=0)
    want_or = skm.recall_score(target, binary, average="micro", zero_division=0)
    np.testing.assert_allclose(got["CP"], round(want_cp * 100, 4), atol=1e-6)
    np.testing.assert_allclose(got["OR"], round(want_or * 100, 4), atol=1e-6)

    # AP against sklearn's definition differs slightly; compare our mAP with
    # a direct implementation of the reference formula
    k = 2
    order = np.argsort(-pred[:, k], kind="stable")
    t = target[order, k]
    pos_count = np.cumsum(t == 1).astype(float)
    total = pos_count[-1]
    pp = pos_count / np.arange(1, 51)
    pp[t != 1] = 0
    want_ap = pp.sum() / (total + 1e-8)
    np.testing.assert_allclose(
        M.average_precision(pred[:, k], target[:, k]), want_ap, atol=1e-9)


def test_mAP_mmcls_difficult_handling():
    pred = np.array([[0.9], [0.8], [0.7], [0.6]])
    target = np.array([[1], [-1], [0], [1]])
    # rank 1: tp=1/1; rank2 difficult skipped from denominator;
    # rank3: not pos; rank4: tp=2, pn=3 -> AP = (1 + 2/3)/2
    np.testing.assert_allclose(M.mAP_mmcls(pred, target), (1 + 2 / 3) / 2 * 100)


def test_average_performance_topk():
    pred = np.array([[0.9, 0.1, 0.5], [0.2, 0.8, 0.3]])
    target = np.array([[1, 0, 1], [0, 1, 0]])
    cp, cr, cf1, op, orr, of1 = M.average_performance(pred, target, thr=None, k=1)
    assert op == 100.0  # both top-1 predictions are hits
    assert orr == pytest.approx(2 / 3 * 100)


def test_accuracy_topk():
    pred = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.3, 0.35, 0.4]])
    target = np.array([1, 0, 1])
    top1, top2 = M.accuracy(pred, target, topk=(1, 2))
    assert top1 == pytest.approx(2 / 3 * 100)
    assert top2 == pytest.approx(100.0)


# ---------------------------------------------------------------- schedules

def test_step_lr_with_warmup_values():
    sched = step_lr_with_warmup(
        1e-4, steps_per_epoch=10, milestones=[10, 50], gamma=0.1,
        warmup_iters=50, warmup_ratio=1e-3)
    # iter 0: base * ratio
    np.testing.assert_allclose(float(sched(0)), 1e-7, rtol=1e-4)
    # end of warmup
    np.testing.assert_allclose(float(sched(50)), 1e-4, rtol=1e-4)
    # after first milestone (epoch 10 = iter 100)
    np.testing.assert_allclose(float(sched(150)), 1e-5, rtol=1e-4)
    # after second milestone
    np.testing.assert_allclose(float(sched(600)), 1e-6, rtol=1e-4)


# ------------------------------------------------------------------- optim

def test_no_decay_mask_paths():
    params = {
        "conv": {"kernel": jnp.zeros(1), "bias": jnp.zeros(1)},
        "norm": {"scale": jnp.zeros(1), "bias": jnp.zeros(1)},
        "pos_embed": jnp.zeros(1),
    }
    mask = no_decay_mask(params)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["pos_embed"] is True  # raw pos_embed param keeps decay


# ------------------------------------------------------------------- config

def test_config_base_merge_and_overrides(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='A', k=9, head=dict(nc=80))\nlr = 1e-4\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = ['base.py']\n"
        "model = dict(k=3, head=dict(_delete_=True, nc2=10))\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model.type == "A"
    assert cfg.model.k == 3
    assert cfg.model.head == {"nc2": 10}
    assert cfg.lr == 1e-4
    cfg.merge_from_options({"model.k": 7, "new.key": 1})
    assert cfg.model.k == 7 and cfg["new"]["key"] == 1


# ------------------------------------------------------- end-to-end training

def test_train_two_steps_smoke():
    import optax

    model = GKGNetClassifier(arch="t", k=3, k_label_gcn=3, n_classes=10,
                             size=128, drop_path=0.1)
    sched = step_lr_with_warmup(1e-3, 10, [5], warmup_iters=2)
    sample = jnp.zeros((2, 128, 128, 3))
    rng = jax.random.PRNGKey(0)
    # two-phase: init to get params for the decay mask, then the real tx
    tmp_state = create_train_state(model, rng, sample, optax.sgd(1e-3), ema=True)
    tx = build_optimizer(tmp_state.params, sched)
    state = tmp_state.replace(opt_state=tx.init(tmp_state.params))

    train_step = make_train_step(model, tx, lr_schedule=sched,
                                 ema_momentum=2e-4, donate=False)

    batch = {
        "img": jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 128, 128, 3)),
            jnp.float32),
        "gt_label": jnp.asarray(
            (np.random.default_rng(1).random((2, 10)) < 0.3), jnp.float32),
    }
    p0 = state.params["backbone"]["stem"]["conv0"]["kernel"]
    logs = None
    for _ in range(2):
        state, logs = train_step(state, batch, jax.random.PRNGKey(7))
    assert int(state.step) == 2
    for k in ("bce_loss", "asy_loss", "loss", "grad_norm", "lr"):
        assert np.isfinite(float(logs[k])), k
    p2 = state.params["backbone"]["stem"]["conv0"]["kernel"]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
    # EMA drifted toward params but not equal
    e2 = state.ema_params["backbone"]["stem"]["conv0"]["kernel"]
    assert not np.allclose(np.asarray(e2), np.asarray(p2))
    assert not np.allclose(np.asarray(e2), np.asarray(p0))

    eval_step = make_eval_step(model)
    scores = eval_step(state, batch["img"])
    assert scores.shape == (2, 10)
    assert np.all((np.asarray(scores) >= 0) & (np.asarray(scores) <= 1))
