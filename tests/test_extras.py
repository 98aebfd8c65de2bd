"""PreciseBN, class-num check, necks, batch augments."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gkgnet_tpu.core.hooks import class_num_check, precise_bn
from gkgnet_tpu.nn.augment import batch_cutmix, batch_mixup, build_batch_augment
from gkgnet_tpu.nn.necks import (
    ChannelMapper,
    FPN,
    GlobalAveragePooling,
    HRFuseScales,
    MultiLabelProjection,
)


def test_precise_bn_recomputes_stats():
    from gkgnet_tpu.core.trainer import create_train_state
    from gkgnet_tpu.nn.layers import BatchNorm
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, **kw):
            return BatchNorm(name="bn")(x, use_running_average=not train)

    model = Tiny()
    rng = np.random.default_rng(0)
    data = rng.standard_normal((4, 8, 8, 3)).astype(np.float32) * 2.0 + 5.0
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((4, 8, 8, 3)), optax.sgd(1e-3))
    batches = [{"img": jnp.asarray(data)} for _ in range(3)]
    new_state = precise_bn(model, state, batches, num_samples=100)
    # stats should now reflect the data distribution (mean ~5, var ~4)
    np.testing.assert_allclose(np.asarray(new_state.batch_stats["bn"]["mean"]),
                               data.mean((0, 1, 2)), atol=0.2)
    np.testing.assert_allclose(np.asarray(new_state.batch_stats["bn"]["var"]),
                               data.var((0, 1, 2)), rtol=0.2)


def test_class_num_check():
    class DS:
        CLASSES = ["a", "b", "c"]

    class_num_check(DS(), 3)
    with pytest.raises(ValueError):
        class_num_check(DS(), 80)


def test_gap_neck():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 8)),
                    jnp.float32)
    out = GlobalAveragePooling().apply({}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).mean((1, 2)),
                               atol=1e-6)


def test_multilabel_projection_neck():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16)),
                    jnp.float32)
    neck = MultiLabelProjection(num_classes=5, in_channels=16, proj_channels=8)
    variables = neck.init(jax.random.PRNGKey(0), x)
    out = neck.apply(variables, x)
    assert out.shape == (2, 5, 8)


def test_pyramid_necks():
    rng = np.random.default_rng(3)
    xs = tuple(jnp.asarray(rng.standard_normal((2, s, s, c)), jnp.float32)
               for s, c in [(8, 16), (4, 32), (2, 64)])

    neck = HRFuseScales(out_channels=24)
    out = neck.apply(neck.init(jax.random.PRNGKey(0), xs), xs)
    assert out.shape == (2, 8, 8, 24)  # fused at the finest grid

    fpn = FPN(out_channels=24)
    outs = fpn.apply(fpn.init(jax.random.PRNGKey(0), xs), xs)
    assert [o.shape for o in outs] == [(2, 8, 8, 24), (2, 4, 4, 24),
                                       (2, 2, 2, 24)]

    cm = ChannelMapper(out_channels=12)
    outs = cm.apply(cm.init(jax.random.PRNGKey(0), xs), xs)
    assert [o.shape for o in outs] == [(2, 8, 8, 12), (2, 4, 4, 12),
                                       (2, 2, 2, 12)]


def test_batch_mixup_and_cutmix():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16, 16, 3)),
                       jnp.float32)
    labels = jnp.eye(4, dtype=jnp.float32)
    mixed, ml = batch_mixup(rng, imgs, labels, alpha=0.5)
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(ml).sum(-1), 1.0, atol=1e-5)
    mixed, ml = batch_cutmix(rng, imgs, labels, alpha=1.0)
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(ml).sum(-1), 1.0, atol=1e-5)


def test_build_batch_augment_switch():
    aug = build_batch_augment([
        dict(type="BatchMixup", alpha=0.2, prob=0.5),
        dict(type="BatchCutMix", alpha=1.0, prob=0.5),
    ])
    imgs = jnp.ones((2, 8, 8, 3))
    labels = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out_imgs, out_labels = jax.jit(aug)(jax.random.PRNGKey(1), imgs, labels)
    assert out_imgs.shape == imgs.shape
    assert out_labels.shape == labels.shape
    assert build_batch_augment(None) is None


def test_imshow_infos_annotated_image(tmp_path):
    """imshow_infos draws text rows and writes the annotated file
    (reference core/visualization/image.py:302-342 equivalent)."""
    from gkgnet_tpu.utils.visualization import imshow_infos, \
        imshow_predictions

    img = np.zeros((96, 128, 3), np.uint8)
    out_file = str(tmp_path / "annotated.png")
    out = imshow_infos(img, {"cat": 0.98, "pred_class": "cat"},
                       font_size=12, row_width=14, out_file=out_file)
    assert out.shape == (96, 128, 3) and out.dtype == np.uint8
    assert out.sum() > 0  # text + backing bars drawn on the black image
    import os as _os
    assert _os.path.exists(out_file)
    from PIL import Image
    assert Image.open(out_file).size == (128, 96)

    out2 = imshow_predictions(img, [{"class_name": "dog", "score": 0.5}])
    assert out2.sum() > 0
