"""Deployment surface: exported-artifact classifiers run through the same
eval harness (reference tools/deployment/test.py + core/export/test.py),
and the serving endpoint handler logic."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MINI_CONFIG = """
model = dict(arch="t", k=3, k_label_gcn=3, num_group=2, drop_path=0.0,
             n_classes=80, size=128, num_gcn=1, dtype="float32",
             head=dict(gamma_pos=0.0, gamma_neg=2.0, clip=0.05))
img_norm = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", size=128, backend="pillow", interpolation="bicubic"),
    dict(type="Normalize", **img_norm),
    dict(type="Collect", keys=("img",)),
]
data = dict(
    samples_per_device=2, workers=2,
    test=dict(type="COCO", data_prefix={img_dir!r}, ann_file={ann!r},
              pipeline=test_pipeline, test_mode=True),
)
mesh = dict(data=1, graph=1)
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("deploy")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(5):
        name = f"im_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (70, 90, 3),
                                     dtype=np.uint8)).save(img_dir / name)
        objects = (rng.random(80) < 0.1).astype(np.int8)
        objects[i % 80] = 1
        records.append({"objects": objects, "file_name": name})
    ann = root / "mini.data"
    with open(ann, "wb") as f:
        pickle.dump(records, f)
    cfg_path = root / "cfg.py"
    cfg_path.write_text(MINI_CONFIG.format(img_dir=str(img_dir),
                                           ann=str(ann)))
    return root, cfg_path


def run(cmd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          env=env, cwd=REPO)


@pytest.mark.slow
def test_export_then_eval_exported(workspace):
    """export.py --verify writes a StableHLO artifact; deployment/test.py
    runs it through the shared eval loop and produces the full metric
    dict — the golden-output parity path of the reference."""
    root, cfg_path = workspace
    artifact = str(root / "model.hlo")
    res = run([sys.executable, "tools/deployment/export.py", str(cfg_path),
               "--format", "stablehlo", "--out", artifact, "--batch", "2",
               "--verify"])
    assert res.returncode == 0, res.stderr[-4000:]
    assert os.path.exists(artifact)

    res = run([sys.executable, "tools/deployment/test.py", str(cfg_path),
               artifact, "--out", str(root / "scores.pkl")])
    assert res.returncode == 0, res.stderr[-4000:]
    import json

    metrics = json.loads(res.stdout[res.stdout.index("{"):])
    assert "mAP" in metrics and np.isfinite(metrics["mAP"])
    with open(root / "scores.pkl", "rb") as f:
        scores = pickle.load(f)
    assert scores.shape == (5, 80)
    assert (scores >= 0).all() and (scores <= 1).all()  # sigmoid outputs


def test_stablehlo_classifier_roundtrip(tmp_path):
    """StableHLOClassifier reproduces the native forward exactly."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from gkgnet_tpu.core.export import load_exported_classifier

    w = jnp.asarray(np.random.default_rng(0).standard_normal((12, 7)),
                    jnp.float32)

    def forward(x):
        return jax.nn.sigmoid(x.reshape(x.shape[0], -1) @ w)

    spec = jax.ShapeDtypeStruct((2, 3, 4), jnp.float32)
    blob = jexport.export(jax.jit(forward))(spec).serialize()
    path = tmp_path / "toy.hlo"
    path.write_bytes(blob)

    clf = load_exported_classifier(str(path))
    assert clf.batch == 2 and clf.input_shape == (2, 3, 4)
    x = np.random.default_rng(1).standard_normal((2, 3, 4)).astype(np.float32)
    np.testing.assert_allclose(clf(x), np.asarray(forward(jnp.asarray(x))),
                               rtol=1e-6, atol=1e-6)
