"""Data layer: COCO pickle dataset, pipelines, wrappers, samplers, loader."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from gkgnet_tpu.data.coco import CocoMultiLabel
from gkgnet_tpu.data.loader import DataLoader, build_dataloader
from gkgnet_tpu.data.pipelines import (
    build_test_pipeline, build_train_pipeline, build_pipeline,
    CropMixup, RandomErasing, Resize, Normalize, Compose, LoadImageFromFile,
)
from gkgnet_tpu.data.samplers import DistributedSampler, RepeatAugSampler
from gkgnet_tpu.data.trivial_augment import STANDARD_OPS, TrivialAugment
from gkgnet_tpu.data.wrappers import ClassBalancedDataset, RepeatDataset


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(12):
        name = f"img_{i:04d}.jpg"
        arr = rng.integers(0, 255, size=(48 + i, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        objects = (rng.random(80) < 0.1).astype(np.int8)
        objects[i % 80] = 1
        records.append({"objects": objects, "file_name": name})
    # make class 0 rare: only in image 0
    for i, r in enumerate(records):
        if i != 0:
            r["objects"][0] = 0
    ann = root / "train.data"
    with open(ann, "wb") as f:
        pickle.dump(records, f)
    return str(img_dir), str(ann)


def test_coco_dataset_load_and_evaluate(coco_dir):
    img_dir, ann = coco_dir
    ds = CocoMultiLabel(img_dir, ann, pipeline=None)
    assert len(ds) == 12
    gt = ds.get_gt_labels()
    assert gt.shape == (12, 80)
    assert 0 in ds.get_cat_ids(0)
    # perfect ranking -> AP=1 for every class with >=1 positive; classes
    # with no positives score 0 under the reference formula (coco.py:87-103)
    res = ds.evaluate(gt.astype(np.float64) * 0.9 + 0.05)
    n_present = (gt.sum(0) > 0).sum()
    assert res["mAP"] == pytest.approx(n_present / 80 * 100, abs=1e-3)
    assert set(res) == {"mAP", "CP", "CR", "CF1", "OP", "OR", "OF1",
                        "CP_top3", "CR_top3", "CF1_top3", "OP_top3",
                        "OR_top3", "OF1_top3"}


def test_test_pipeline_shapes(coco_dir):
    img_dir, ann = coco_dir
    ds = CocoMultiLabel(img_dir, ann, pipeline=build_test_pipeline(64))
    out = ds.prepare_data(3, np.random.default_rng(0))
    assert out["img"].shape == (64, 64, 3)
    assert out["img"].dtype == np.float32
    assert "gt_label" not in out  # test pipeline collects img only


def test_train_pipeline_shapes_and_determinism(coco_dir):
    img_dir, ann = coco_dir
    ds = CocoMultiLabel(img_dir, ann, pipeline=build_train_pipeline(64))
    a = ds.prepare_data(5, np.random.default_rng(42))
    b = ds.prepare_data(5, np.random.default_rng(42))
    c = ds.prepare_data(5, np.random.default_rng(43))
    assert a["img"].shape == (64, 64, 3)
    assert a["gt_label"].shape == (80,)
    np.testing.assert_array_equal(a["img"], b["img"])
    assert not np.array_equal(a["img"], c["img"])


def test_build_pipeline_from_config():
    cfgs = [
        dict(type="LoadImageFromFile"),
        dict(type="Resize", size=32, backend="pillow", interpolation="bicubic"),
        dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255]),
        dict(type="ImageToTensor", keys=["img"]),
        dict(type="Collect", keys=["img"]),
    ]
    pipe = build_pipeline(cfgs)
    out = pipe({"img": np.zeros((48, 48, 3), np.uint8)}, np.random.default_rng(0))
    assert out["img"].shape == (32, 32, 3)


def test_cropmixup_both_branches():
    img = np.random.default_rng(0).integers(0, 255, (80, 100, 3), dtype=np.uint8)
    cm = CropMixup(p=1.0, size=64, scale=0.01, number=234)
    out = cm({"img": img.copy()}, np.random.default_rng(1))
    assert out["img"].shape == (64, 64, 3) and out["img"].dtype == np.uint8
    cm0 = CropMixup(p=0.0, size=64)
    out0 = cm0({"img": img.copy()}, np.random.default_rng(1))
    assert out0["img"].shape == (64, 64, 3)


def test_random_erasing_fills_region():
    img = np.zeros((64, 64, 3), np.uint8)
    re = RandomErasing(erase_prob=1.0, mode="rand", min_area_ratio=0.1,
                       max_area_ratio=0.3, fill_color=(128, 128, 128),
                       fill_std=(1, 1, 1))
    out = re({"img": img}, np.random.default_rng(0))
    frac = (out["img"] > 0).any(-1).mean()
    assert 0.05 < frac < 0.5


def test_trivial_all_ops_run():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8))
    rng = np.random.default_rng(0)
    for name, op in STANDARD_OPS:
        out = op(img, 30, rng)
        assert out.size == img.size, name
    aug = TrivialAugment()
    for _ in range(20):
        aug(img, rng)


def test_class_balanced_repeat_factors():
    class Fake:
        CLASSES = ["a", "b"]

        def __len__(self):
            return 4

        def get_cat_ids(self, idx):
            return [0] if idx == 0 else [1]

        def prepare_data(self, idx, rng=None):
            return idx

    # f(0)=1/4, f(1)=3/4; thr=1.0 -> r0 = sqrt(1/(1/4)) = 2, r1 = sqrt(4/3)
    ds = ClassBalancedDataset(Fake(), oversample_thr=1.0)
    # image 0 repeated ceil(2)=2; others ceil(1.155)=2 each
    assert len(ds) == 8
    assert ds.repeat_indices.count(0) == 2


def test_distributed_sampler_shards_cover_dataset():
    class Fake:
        def __len__(self):
            return 10

    parts = []
    for rank in range(4):
        s = DistributedSampler(Fake(), num_replicas=4, rank=rank, seed=1)
        s.set_epoch(3)
        parts.append(list(s))
    assert all(len(p) == 3 for p in parts)  # ceil(10/4)
    flat = [i for p in parts for i in p]
    assert set(flat) == set(range(10))


def test_repeat_aug_sampler_matches_reference_semantics():
    class Fake:
        def __len__(self):
            return 512

    ranks = [list(RepeatAugSampler(Fake(), num_replicas=4, rank=r,
                                   shuffle=False, seed=0)) for r in range(4)]
    # num_selected = floor(512/256)*256/4 = 128 per rank
    assert all(len(r) == 128 for r in ranks)
    # repeats of a sample land on different ranks: unshuffled indices are
    # [0,0,0,1,1,1,...] round-robined
    assert ranks[0][:3] == [0, 1, 2] or ranks[0][0] == 0
    combined = sorted(sum(ranks, []))
    # first 170 dataset items appear ~3 times total across ranks
    assert combined.count(0) == 3


def test_dataloader_batches_and_epoch_determinism(coco_dir):
    img_dir, ann = coco_dir
    ds = CocoMultiLabel(img_dir, ann, pipeline=build_train_pipeline(32))
    dl = build_dataloader(ds, samples_per_gpu=4, workers_per_gpu=2, seed=7)
    dl.set_epoch(0)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["img"].shape == (4, 32, 32, 3)
    assert batches[0]["gt_label"].shape == (4, 80)
    dl.set_epoch(0)
    again = list(dl)
    np.testing.assert_array_equal(batches[0]["img"], again[0]["img"])
    dl.set_epoch(1)
    other = list(dl)
    assert not np.array_equal(batches[0]["img"], other[0]["img"])


def test_repeat_dataset(coco_dir):
    img_dir, ann = coco_dir
    ds = CocoMultiLabel(img_dir, ann)
    rd = RepeatDataset(ds, 3)
    assert len(rd) == 36


def test_uni_augment_cutout_crop_bilinear_blend():
    """Round-4 aug-space completion (aug_lib.py:215-345,638-657):
    CropBilinear / Cutout / SamplePairing ops + UniAugment[Weighted]
    wrappers run, are rng-deterministic, and keep shape."""
    from PIL import Image as PILImage

    from gkgnet_tpu.data.pipelines import Cutout, UniAug, UniAugWeighted
    from gkgnet_tpu.data.trivial_augment import (
        OPS_BY_NAME, PARAMETER_MAX, SamplePairing)

    img = np.random.default_rng(0).integers(0, 255, (48, 64, 3),
                                            dtype=np.uint8)
    for cls in (UniAug(), UniAugWeighted(probs=(0.0, 0.0, 1.0)),
                Cutout(level=PARAMETER_MAX, p=1.0)):
        out1 = cls({"img": img.copy()}, np.random.default_rng(3))["img"]
        out2 = cls({"img": img.copy()}, np.random.default_rng(3))["img"]
        assert out1.shape == img.shape and (out1 == out2).all()

    # cutout at max level actually zeroes a patch
    out = Cutout(level=PARAMETER_MAX, p=1.0)(
        {"img": np.full((48, 64, 3), 255, np.uint8)},
        np.random.default_rng(1))["img"]
    assert (out == 0).any() and (out == 255).any()

    pil = PILImage.fromarray(img)
    rng = np.random.default_rng(7)
    # crop_bilinear crops a 10px border at max level and resizes back
    got = OPS_BY_NAME["crop_bilinear"](pil, PARAMETER_MAX, rng)
    assert got.size == pil.size
    assert np.abs(np.asarray(got).astype(int) - img.astype(int)).max() > 0

    # SamplePairing blends toward the pool image (max level = 0.4 mix)
    pool = [PILImage.fromarray(np.zeros((48, 64, 3), np.uint8))]
    blended = SamplePairing(pool)(pil, PARAMETER_MAX, rng)
    assert np.asarray(blended).mean() < img.mean()
    assert np.asarray(blended).mean() > 0.5 * img.mean()


def test_rand_augment_and_auto_augment():
    """RandAug / AutoAug wrappers (reference auto_augment.py — registered
    transforms) run every policy op and are rng-deterministic."""
    from gkgnet_tpu.data.pipelines import AutoAug, RandAug
    from gkgnet_tpu.data.trivial_augment import (
        AutoAugment, IMAGENET_POLICY, OPS_BY_NAME, PARAMETER_MAX)

    img = np.random.default_rng(0).integers(0, 255, (48, 64, 3),
                                            dtype=np.uint8)

    out1 = RandAug(n=2, m=15)({"img": img.copy()},
                              np.random.default_rng(3))["img"]
    out2 = RandAug(n=2, m=15)({"img": img.copy()},
                              np.random.default_rng(3))["img"]
    assert out1.shape == img.shape and (out1 == out2).all()

    out1 = AutoAug()({"img": img.copy()}, np.random.default_rng(5))["img"]
    out2 = AutoAug()({"img": img.copy()}, np.random.default_rng(5))["img"]
    assert out1.shape == img.shape and (out1 == out2).all()

    # every op named in the ImageNet policy exists and runs at max level
    from PIL import Image as PILImage

    pil = PILImage.fromarray(img)
    rng = np.random.default_rng(7)
    for policy in IMAGENET_POLICY:
        for name, _, _ in policy:
            got = OPS_BY_NAME[name](pil, PARAMETER_MAX, rng)
            assert got.size == pil.size

    # a zero-prob policy is identity
    aug = AutoAugment([[("rotate", 0.0, 9)]])
    got = np.asarray(aug(pil, np.random.default_rng(0)))
    assert (got == img).all()


def test_device_normalize_matches_host_normalize():
    """Normalize(device=True) ships uint8 through collate; the trainer's
    device_normalize then reproduces the host path bitwise-for-math."""
    from gkgnet_tpu.core.trainer import (make_device_normalize,
                                         pipeline_device_norm)
    from gkgnet_tpu.data.loader import default_collate

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            for _ in range(3)]
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]

    host = Normalize(mean, std)
    want = np.stack([host({"img": i.copy()})["img"] for i in imgs])

    dev = Normalize(mean, std, device=True)
    outs = [dev({"img": i.copy()})["img"] for i in imgs]
    assert all(o.dtype == np.uint8 for o in outs)
    batch = default_collate([{"img": o} for o in outs])
    assert batch["img"].dtype == np.uint8

    cfg = [dict(type="LoadImageFromFile"),
           dict(type="Normalize", mean=mean, std=std, device=True)]
    norm = pipeline_device_norm(cfg)
    assert norm == (tuple(mean), tuple(std))
    got = np.asarray(make_device_normalize(norm)(batch["img"]))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # float batches pass through untouched
    passthrough = make_device_normalize(norm)(want.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(passthrough), want)
