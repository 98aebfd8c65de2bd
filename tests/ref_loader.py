"""Load the *actual* reference model code (/root/reference/mmcls/models/
backbones) as importable torch modules, with minimal shims for its external
dependencies (timm DropPath, mmcv.cnn builders, easydict, registries).

The reference's graph core (vig_model/torch_edge.py) is pure torch; the
vertex/backbone modules only need SyncBN->BN (numerically identical in
single-process eval/train) and a DropPath implementation. Nothing from the
reference is executed at import time beyond class definitions.

Used by tests/test_golden_reference.py to assert parity of this framework
against the real reference modules instead of hand-written replicas
(VERDICT round 1, item 1a).
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference/mmcls/models"

_cache: dict = {}


def _mk(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _load(fullname: str, path: str) -> types.ModuleType:
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference() -> dict:
    """Returns {'torch_edge', 'torch_nn', 'torch_vertex', 'pos_embed',
    'gkgnet', 'differentiable_topk'} — the real reference modules."""
    if _cache:
        return _cache

    import torch
    from torch import nn

    class DropPath(nn.Module):
        # timm.models.layers.DropPath semantics (per-sample keep mask)
        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = float(drop_prob)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    def build_norm_layer(cfg, num_features, postfix=1):
        # reference norm_cfg is SyncBN; plain BatchNorm2d has identical math
        # (and an identical state_dict) outside multi-process training
        return f"bn{postfix}", nn.BatchNorm2d(num_features)

    def build_conv_layer(cfg, *args, **kwargs):
        return nn.Conv2d(*args, **kwargs)

    def constant_init(module, val, bias=0.0):
        if getattr(module, "weight", None) is not None:
            nn.init.constant_(module.weight, val)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    class ConvModule(nn.Module):  # imported by the reference, unused at runtime
        pass

    class BaseModule(nn.Module):  # mmcv.runner.BaseModule surface
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    class EasyDict(dict):
        def __init__(self, d=None):
            super().__init__()
            for k, v in (d or {}).items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

    class _Registry:
        def register_module(self, *args, **kwargs):
            if args and isinstance(args[0], type):
                return args[0]

            def deco(cls):
                return cls

            return deco

    # the reference hardcodes .cuda() in forward (gkgnet.py:264); make it a
    # no-op on CPU-only hosts so the real module runs in tests
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore

    _mk("timm")
    _mk("timm.models")
    _mk("timm.models.layers", DropPath=DropPath)
    _mk("timm.data",
        IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
        IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225))
    _mk("mmcv")
    _mk("mmcv.cnn", ConvModule=ConvModule, build_conv_layer=build_conv_layer,
        build_norm_layer=build_norm_layer, constant_init=constant_init)
    _mk("mmcv.cnn.bricks", DropPath=DropPath)
    _mk("mmcv.runner", BaseModule=BaseModule)
    _mk("easydict", EasyDict=EasyDict)

    # synthetic mmcls package skeleton (the real mmcls/__init__ needs
    # mmcv-full; we only want the model files)
    for name in ("mmcls", "mmcls.models", "mmcls.models.utils",
                 "mmcls.models.backbones"):
        _mk(name).__path__ = []
    _mk("mmcls.models.builder",
        BACKBONES=_Registry(), NECKS=_Registry(), HEADS=_Registry(),
        LOSSES=_Registry(), CLASSIFIERS=_Registry())

    # the reference's pos_embed.py uses the long-removed np.float alias
    import numpy as np

    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]

    dtopk = _load("mmcls.models.utils.differentiable_topk",
                  f"{REF_ROOT}/utils/differentiable_topk.py")
    vig_pkg = _mk("mmcls.models.backbones.vig_model")
    vig_pkg.__path__ = [f"{REF_ROOT}/backbones/vig_model"]
    base = f"mmcls.models.backbones.vig_model"
    torch_nn = _load(f"{base}.torch_nn", f"{REF_ROOT}/backbones/vig_model/torch_nn.py")
    pos_embed = _load(f"{base}.pos_embed", f"{REF_ROOT}/backbones/vig_model/pos_embed.py")
    torch_edge = _load(f"{base}.torch_edge", f"{REF_ROOT}/backbones/vig_model/torch_edge.py")
    torch_vertex = _load(f"{base}.torch_vertex", f"{REF_ROOT}/backbones/vig_model/torch_vertex.py")
    # the vig_model package surface gkgnet.py imports from
    vig_pkg.Grapher = torch_vertex.Grapher
    vig_pkg.GrapherLabel = torch_vertex.GrapherLabel
    vig_pkg.act_layer = torch_nn.act_layer
    _load("mmcls.models.backbones.base_backbone",
          f"{REF_ROOT}/backbones/base_backbone.py")
    gkgnet = _load("mmcls.models.backbones.gkgnet", f"{REF_ROOT}/backbones/gkgnet.py")

    _cache.update(dict(torch_edge=torch_edge, torch_nn=torch_nn,
                       torch_vertex=torch_vertex, pos_embed=pos_embed,
                       gkgnet=gkgnet, differentiable_topk=dtopk))
    return _cache
