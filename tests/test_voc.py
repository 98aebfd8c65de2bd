"""PASCAL VOC multi-label dataset: XML parsing, difficult handling, eval."""

import pickle

import numpy as np
import pytest
from PIL import Image

from gkgnet_tpu.data.voc import VOC_CLASSES, VOCMultiLabel


def _write_xml(path, objects):
    """objects: list of (class_name, difficult)."""
    body = "".join(
        f"<object><name>{n}</name><difficult>{int(d)}</difficult></object>"
        for n, d in objects
    )
    path.write_text(f"<annotation>{body}</annotation>")


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("VOC2007")
    (root / "Annotations").mkdir()
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = []
    plans = [
        [("dog", 0), ("cat", 0)],
        [("dog", 1)],                      # only-difficult dog -> -1
        [("person", 0), ("person", 1)],    # difficult + normal -> 1
        [("car", 0), ("bottle", 0), ("unknown_cls", 0)],  # unknown skipped
    ]
    for i, objs in enumerate(plans):
        img_id = f"00{i:04d}"
        ids.append(img_id)
        arr = rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "JPEGImages" / f"{img_id}.jpg")
        _write_xml(root / "Annotations" / f"{img_id}.xml", objs)
    split = root / "ImageSets" / "Main" / "trainval.txt"
    split.write_text("\n".join(ids) + "\n")
    return root


def test_voc_xml_parse_and_difficult(voc_dir):
    ds = VOCMultiLabel(str(voc_dir),
                       str(voc_dir / "ImageSets" / "Main" / "trainval.txt"),
                       test_mode=True)
    assert len(ds) == 4
    gt = ds.get_gt_labels()
    assert gt.shape == (4, 20)
    dog, cat = VOC_CLASSES.index("dog"), VOC_CLASSES.index("cat")
    person = VOC_CLASSES.index("person")
    assert gt[0, dog] == 1 and gt[0, cat] == 1
    assert gt[1, dog] == -1                      # only-difficult
    assert gt[2, person] == 1                    # normal wins over difficult
    assert gt[3].sum() == 2                      # unknown class dropped
    assert ds.get_cat_ids(1) == []               # -1 is not a positive


def test_voc_train_maps_difficult_to_positive(voc_dir):
    split = str(voc_dir / "ImageSets" / "Main" / "trainval.txt")
    train = VOCMultiLabel(str(voc_dir), split, test_mode=False)
    dog = VOC_CLASSES.index("dog")
    assert train.prepare_data(1)["gt_label"][dog] == 1    # abs() at train
    test = VOCMultiLabel(str(voc_dir), split, test_mode=True)
    assert test.prepare_data(1)["gt_label"][dog] == -1


def test_voc_evaluate_difficult_excluded(voc_dir):
    ds = VOCMultiLabel(str(voc_dir),
                       str(voc_dir / "ImageSets" / "Main" / "trainval.txt"),
                       test_mode=True)
    gt = ds.get_gt_labels().astype(np.float64)
    # score difficult (-1) samples HIGH: they must not hurt mAP because the
    # mmcls AP excludes -1 rows from the ranking denominator
    scores = np.where(gt == -1, 0.99, gt * 0.9 + 0.05)
    res = ds.evaluate(scores)
    assert set(res) == {"mAP", "CP", "CR", "CF1", "OP", "OR", "OF1"}
    present = (gt == 1).any(axis=0)
    # classes with >=1 positive get AP 1 under a perfect ranking
    expected = present.sum() / 20 * 100 if present.any() else 0.0
    assert res["mAP"] == pytest.approx(expected, abs=1e-2)


def test_voc_pickle_path(voc_dir, tmp_path):
    records = [
        {"objects": np.eye(20, dtype=np.int8)[i], "file_name": f"x{i}.jpg"}
        for i in range(3)
    ]
    ann = tmp_path / "voc.data"
    with open(ann, "wb") as f:
        pickle.dump(records, f)
    ds = VOCMultiLabel(str(tmp_path), str(ann), test_mode=True)
    assert len(ds) == 3
    assert ds.get_cat_ids(2) == [2]


def test_voc_builder_and_pipeline(voc_dir):
    from gkgnet_tpu.core.builder import build_dataset

    cfg = dict(
        type="VOC",
        data_prefix=str(voc_dir),
        ann_file=str(voc_dir / "ImageSets" / "Main" / "trainval.txt"),
        test_mode=True,
        pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="Resize", size=32, backend="pillow",
                 interpolation="bicubic"),
            dict(type="Normalize", mean=[0, 0, 0], std=[255, 255, 255]),
            dict(type="Collect", keys=("img", "gt_label")),
        ],
    )
    ds = build_dataset(cfg)
    assert ds.test_mode is True
    out = ds[0]
    assert out["img"].shape == (32, 32, 3)
    assert out["gt_label"].shape == (20,)


def test_voc_config_loads():
    from gkgnet_tpu.core.config import Config

    cfg = Config.fromfile("configs/gkgnet_voc_448.py")
    assert cfg.model["n_classes"] == 20
    assert cfg.model["size"] == 448
    assert cfg.data["train"]["type"] == "VOC"
    assert cfg.runner["max_epochs"] == 40
