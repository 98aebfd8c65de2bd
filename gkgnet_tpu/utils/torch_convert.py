"""Torch -> JAX checkpoint conversion for reference GKGNet weights.

Maps the reference's state_dict naming (mmcv ImageClassifier:
``backbone.stem.convs.*``, ``backbone.backbone.{i}.{0,1}.*``,
``backbone.gcn_label.{j}.{k}.*``, ``head.fc{1,2}.*``) onto this framework's
variable tree, with the layout transforms:

  * 3x3 conv  (Cout, Cin, kh, kw) -> (kh, kw, Cin, Cout)
  * 1x1 conv  (Cout, Cin, 1, 1)   -> PointwiseConv (1, Cin, Cout)
  * grouped 1x1 (Cout, Cin/G, 1, 1) -> (G, Cin/G, Cout/G)
  * Linear    (Cout, Cin)         -> Dense kernel (Cin, Cout)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
  * pos_embed (1, C, H, W)        -> (1, H, W, C)
  * head.fc1.weight (C_cls, Cin)  -> fc1_kernel as-is (diag-score layout)

The non-trainable ``relative_pos`` buffers of the reference are *not*
imported — this framework recomputes them exactly (ops/pos_embed.py, parity
tested vs torch bicubic).

Conversion is template-driven: every leaf of the target variable tree is
looked up in the torch state_dict, so a missing/mis-shaped torch key is a
hard error with a precise message.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv3x3_w(x):
    return _t(x).transpose(2, 3, 1, 0)


def conv1x1_w(x, groups: int):
    w = _t(x)[:, :, 0, 0]  # (Cout, Cin/G)
    cout, cin_g = w.shape
    return w.reshape(groups, cout // groups, cin_g).transpose(0, 2, 1)


def linear_w(x):
    return _t(x).T


class ConversionError(KeyError):
    pass


def _stem_index(name: str) -> int:
    # Stem Sequential: [conv, bn, act, conv, bn, act, conv, bn]
    return {"conv0": 0, "norm0": 1, "conv1": 3, "norm1": 4,
            "conv2": 6, "norm2": 7}[name]


def _map_module_path(path: list[str]) -> tuple[str, str]:
    """Map our sub-module path inside a Grapher/GrapherLabel/FFN/Downsample
    to the reference's sequential naming. Returns (torch_prefix, kind) where
    kind in {conv1x1, grouped, norm, conv3x3, dense, embed, raw}."""
    p = path
    if p[0] in ("fc1", "fc2"):  # ConvNorm
        idx = {"conv": 0, "norm": 1}[p[1]]
        return f"{p[0]}.{idx}", "conv1x1" if p[1] == "conv" else "norm"
    if p[0] == "graph_conv":  # .gconv.nn (BasicConv, groups=4)
        assert p[1] == "gconv"
        if len(p) == 2:  # scalar param directly on the aggregator (gin eps)
            return "graph_conv.gconv", "raw"
        sub = p[2]  # 'nn' / 'nn1' / 'nn2' / 'a'
        if sub == "a":
            return "graph_conv.gconv.a", "conv1x1"
        m = re.fullmatch(r"(conv|norm|act)(\d+)", p[3])
        idx = int(m.group(2)) * 3 + {"conv": 0, "norm": 1, "act": 2}[m.group(1)]
        kind = "grouped" if m.group(1) == "conv" else "norm"
        return f"graph_conv.gconv.{sub}.{idx}", kind
    if p[0] == "ffn":  # FFNLabel inside GrapherLabel
        idx = {"conv": 0, "norm": 1}[p[2]]
        return f"ffn.{p[1]}.{idx}", "conv1x1" if p[2] == "conv" else "norm"
    raise ConversionError(f"unmapped module path {path}")


def _leaf_suffix(kind: str, leaf: str, collection: str) -> str:
    if kind == "norm":
        if collection == "batch_stats":
            return {"mean": "running_mean", "var": "running_var"}[leaf]
        return {"scale": "weight", "bias": "bias"}[leaf]
    return {"kernel": "weight", "bias": "bias", "embedding": "weight"}.get(leaf, leaf)


def torch_key_and_transform(collection: str, path: tuple[str, ...]):
    """Full mapping: our (collection, path) -> (torch_key, transform_fn)."""
    p = list(path)
    leaf = p.pop()

    def ident(x):
        return _t(x)

    if p and p[0] == "head":
        if leaf == "fc1_kernel":
            return "head.fc1.weight", ident
        if leaf == "fc1_bias":
            return "head.fc1.bias", ident
        if p[-1] == "fc2":
            return f"head.fc2.{_leaf_suffix('dense', leaf, collection)}", \
                (linear_w if leaf == "kernel" else ident)
        raise ConversionError(f"unmapped head path {path}")

    assert p and p[0] == "backbone", path
    p = p[1:]

    if not p:  # pos_embed param at backbone level
        if leaf == "pos_embed":
            return "backbone.pos_embed", lambda x: _t(x).transpose(0, 2, 3, 1)
        raise ConversionError(f"unmapped backbone leaf {leaf}")

    head_name = p[0]
    if head_name == "stem":
        idx = _stem_index(p[1])
        kind = "conv3x3" if p[1].startswith("conv") else "norm"
        key = f"backbone.stem.convs.{idx}.{_leaf_suffix(kind, leaf, collection)}"
        tf = conv3x3_w if (kind == "conv3x3" and leaf == "kernel") else ident
        return key, tf
    if head_name == "label_lt":
        return "backbone.label_lt.weight", ident
    m = re.fullmatch(r"backbone_(\d+)(?:_(grapher|ffn))?", head_name)
    if m:
        i, role = int(m.group(1)), m.group(2)
        if role is None:  # Downsample: Seq[conv, bn] under .conv
            idx = {"conv": 0, "norm": 1}[p[1]]
            kind = "conv3x3" if p[1] == "conv" else "norm"
            key = f"backbone.backbone.{i}.conv.{idx}." \
                  f"{_leaf_suffix(kind, leaf, collection)}"
            tf = conv3x3_w if (kind == "conv3x3" and leaf == "kernel") else ident
            return key, tf
        slot = 0 if role == "grapher" else 1
        sub_key, kind = _map_module_path(p[1:])
        suffix = leaf if kind == "raw" else _leaf_suffix(kind, leaf, collection)
        key = f"backbone.backbone.{i}.{slot}.{sub_key}.{suffix}"
        if leaf == "kernel" and kind == "conv1x1":
            return key, lambda x: conv1x1_w(x, 1)
        if leaf == "kernel" and kind == "grouped":
            return key, lambda x: conv1x1_w(x, 4)
        return key, ident
    m = re.fullmatch(r"gcn_label_(\d+)_(\d+)", head_name)
    if m:
        j, k = int(m.group(1)), int(m.group(2))
        sub_key, kind = _map_module_path(p[1:])
        suffix = leaf if kind == "raw" else _leaf_suffix(kind, leaf, collection)
        key = f"backbone.gcn_label.{j}.{k}.{sub_key}.{suffix}"
        if leaf == "kernel" and kind == "conv1x1":
            return key, lambda x: conv1x1_w(x, 1)
        if leaf == "kernel" and kind == "grouped":
            return key, lambda x: conv1x1_w(x, 4)
        return key, ident
    m = re.fullmatch(r"ffn_label_(\d+)", head_name)
    if m:
        j = int(m.group(1))
        key = f"backbone.ffn_label.{j}.0.{_leaf_suffix('dense', leaf, collection)}"
        return key, (linear_w if leaf == "kernel" else ident)
    raise ConversionError(f"unmapped path {path}")


def _walk(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, prefix + (k,))
    else:
        yield prefix, tree


def convert_reference_checkpoint(state_dict: dict, variables: dict,
                                 strict: bool = True,
                                 report: dict | None = None) -> dict:
    """Fill a variables template {'params', 'batch_stats', ...} from a
    reference torch state_dict. Returns a new variables dict (constants and
    any unmatched collections are passed through).

    strict=True (full-checkpoint import): any missing torch key or shape
    mismatch is a hard error with a precise message.

    strict=False (partial import — the reference's non-strict
    ``load_state_dict`` used for the ImageNet pvig_s *backbone-only*
    bootstrap, gkgnet.py:255-261 + configs/gkgnet/gkgnet_coco_576.py:19-24):
    leaves whose torch key is absent or mis-shaped keep their template
    (fresh-init) value, and the outcome is recorded in ``report``:
    ``{'loaded': [...], 'missing': [...], 'mismatched': [...],
    'unused': [...]}`` (torch keys; 'unused' = present in the state_dict but
    not consumed — e.g. pvig_s's `prediction.*` ImageNet head).
    """
    out: dict[str, Any] = {}
    missing, mismatched, loaded = [], [], []
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        new_tree: dict = {}
        for path, leaf in _walk(variables[collection]):
            try:
                key, tf = torch_key_and_transform(collection, path)
            except ConversionError:
                if strict:
                    raise
                key, tf = None, None
            val = None
            if key is not None:
                if key not in state_dict:
                    missing.append(key)
                else:
                    cand = tf(state_dict[key]).astype(np.float32)
                    if tuple(cand.shape) != tuple(np.shape(leaf)):
                        mismatched.append((key, cand.shape, np.shape(leaf)))
                    else:
                        val = cand
                        loaded.append(key)
            if val is None:
                if strict:
                    continue  # collected; raised below with the full list
                val = np.asarray(leaf)  # keep template init
            node = new_tree
            for part in path[:-1]:
                node = node.setdefault(part, {})
            node[path[-1]] = val
        out[collection] = new_tree
    if strict and (missing or mismatched):
        raise ConversionError(
            f"missing keys: {missing[:10]}{'...' if len(missing) > 10 else ''}; "
            f"shape mismatches: {mismatched[:10]}")
    if report is not None:
        consumed = set(loaded) | set(missing) | {m[0] for m in mismatched}
        report.update(
            loaded=sorted(loaded), missing=sorted(missing),
            mismatched=sorted(mismatched, key=str),
            unused=sorted(k for k in state_dict
                          if k not in consumed
                          and not k.endswith("num_batches_tracked")
                          and not k.endswith("relative_pos")
                          and not k.endswith("label_input")))
    for collection in variables:
        if collection not in out:
            out[collection] = variables[collection]
    return out


def expected_torch_shapes(variables: dict) -> dict[str, tuple]:
    """Inverse view for tests/tools: every torch key the converter will read
    and the shape it must have (derived by inverting the transforms)."""
    shapes: dict[str, tuple] = {}
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, leaf in _walk(variables[collection]):
            key, _ = torch_key_and_transform(collection, path)
            shp = tuple(np.shape(leaf))
            leaf_name = path[-1]
            if key.endswith("pos_embed"):
                shp = (shp[0], shp[3], shp[1], shp[2])
            elif leaf_name == "kernel" and len(shp) == 4:  # 3x3 conv
                shp = (shp[3], shp[2], shp[0], shp[1])
            elif leaf_name == "kernel" and len(shp) == 3:  # pointwise (g,i,o)
                g, cin_g, cout_g = shp
                shp = (g * cout_g, cin_g, 1, 1)
            elif leaf_name == "kernel" and len(shp) == 2:  # dense
                shp = (shp[1], shp[0])
            shapes[key] = shp
    return shapes


def load_torch_checkpoint(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in ckpt.items()}
