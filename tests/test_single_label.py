"""Single-label dataset + extra losses (seesaw/contrastive)."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from gkgnet_tpu.data.single_label import ImageListDataset
from gkgnet_tpu.nn import losses as L


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("sl")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        name = f"x_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
                        ).save(root / name)
        lines.append(f"{name} {i % 3}")
    ann = root / "ann.txt"
    ann.write_text("\n".join(lines))
    return str(root), str(ann)


def test_image_list_dataset(folder):
    prefix, ann = folder
    ds = ImageListDataset(prefix, ann, classes=["a", "b", "c"])
    assert len(ds) == 6
    assert ds.get_cat_ids(4) == [1]
    gt = ds.get_gt_labels()
    # perfect predictions
    pred = np.eye(3)[gt] * 10.0
    out = ds.evaluate(pred, metric=["accuracy", "precision", "recall",
                                    "f1_score", "support"],
                      metric_options={"topk": (1,)})
    assert out["accuracy_top-1"] == 100.0
    assert out["precision"] == pytest.approx(100.0)
    assert out["support"] == 6


def test_builder_image_list(folder):
    prefix, ann = folder
    from gkgnet_tpu.core.builder import build_dataset

    ds = build_dataset(dict(type="ImageList", data_prefix=prefix,
                            ann_file=ann))
    assert len(ds) == 6


def test_seesaw_loss_reduces_to_ce_when_disabled():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
    label = jnp.asarray([0, 1, 2, 3])
    cum = jnp.ones(5)
    see = float(L.seesaw_loss(pred, label, cum, p=0.0, q=0.0))
    ce = float(L.cross_entropy(pred, label))
    np.testing.assert_allclose(see, ce, rtol=1e-5)


def test_seesaw_loss_mitigates_rare_classes():
    pred = jnp.zeros((2, 3), jnp.float32)
    label = jnp.asarray([0, 0])
    # class 0 has far more samples than 1,2 -> negative logits of rare
    # classes get discounted -> loss below plain CE
    cum = jnp.asarray([1000.0, 1.0, 1.0])
    see = float(L.seesaw_loss(pred, label, cum, p=0.8, q=0.0))
    ce = float(L.cross_entropy(pred, label))
    assert see < ce


def test_contrastive_loss_prefers_aligned_pairs():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    aligned = float(L.contrastive_loss(a, a))
    shuffled = float(L.contrastive_loss(a, a[::-1]))
    assert aligned < shuffled
