"""GKGNet-B (pvig_b geometry) registry entry: shape-only validation via
eval_shape (no FLOPs — the B model is too wide to run on the CPU suite)."""

import jax
import jax.numpy as jnp

from gkgnet_tpu.nn.classifier import GKGNetClassifier
from gkgnet_tpu.nn.gkgnet import ARCH_SETTINGS


def test_arch_b_registry():
    b = ARCH_SETTINGS["b"]
    assert b["blocks"] == (2, 2, 18, 2)
    assert b["channels"] == (128, 256, 512, 1024)


def test_arch_b_shapes_eval_shape():
    model = GKGNetClassifier(arch="b", n_classes=80, size=224)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x))
    params = variables["params"]
    # head fed by the final stage width 1024
    assert params["head"]["fc1_kernel"].shape == (80, 1024)
    # label embedding at stage-0 width 128
    assert params["backbone"]["label_lt"]["embedding"].shape == (80, 128)
    # 24 grapher blocks + 3 downsamples = 27 backbone modules
    names = [k for k in params["backbone"] if k.startswith("backbone_")]
    assert len({n.split("_")[1] for n in names}) == 27
    out, _ = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables)
    assert out.shape == (1, 80)


def test_b_and_dist_configs_load():
    from gkgnet_tpu.core.config import Config

    cfg = Config.fromfile("configs/gkgnet_b_coco_576.py")
    assert cfg.model["arch"] == "b"
    assert cfg.data["samples_per_device"] == 8

    cfg = Config.fromfile("configs/gkgnet_coco_768_dist.py")
    assert cfg.model["size"] == 768 and cfg.model["k"] == 16
    assert cfg.mesh["graph"] == 4
    # the override must deep-merge into the ClassBalanced-wrapped dataset
    assert cfg.data["train"]["type"] == "ClassBalancedDataset"
    pipeline = cfg.data["train"]["dataset"]["pipeline"]
    assert any(p.get("size") == 768 for p in pipeline if "size" in p)
