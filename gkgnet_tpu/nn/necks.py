"""Necks (reference mmcls/models/necks — registered for API completeness;
the live GKGNet config uses ``neck=None`` with GAP inline in the backbone,
gkgnet.py:243,278)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def build_neck(cfg: dict, dtype=jnp.float32) -> nn.Module:
    """Neck config -> module (the reference's NECKS registry dispatch)."""
    cfg = dict(cfg)
    t = cfg.pop("type")
    cfg.pop("out_indices", None)  # consumed by the classifier
    table = {
        "GlobalAveragePooling": GlobalAveragePooling,
        "MultiLabelProjection": MultiLabelProjection,
        "HRFuseScales": HRFuseScales,
        "ChannelMapper": ChannelMapper,
        "FPN": FPN,
    }
    if t not in table:
        raise ValueError(f"unknown neck type {t}")
    cls = table[t]
    if t == "GlobalAveragePooling":
        # parameterless; out_channels in the cfg only sizes the head
        cfg.pop("out_channels", None)
    else:
        cfg.setdefault("dtype", dtype)
    return cls(**cfg)


class GlobalAveragePooling(nn.Module):
    """GAP over spatial dims (necks/gap.py:9-46); NHWC in, (B, C) out."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if isinstance(x, (tuple, list)):
            return tuple(jnp.mean(xi, axis=(1, 2)) for xi in x)
        return jnp.mean(x, axis=(1, 2))


class MultiLabelProjection(nn.Module):
    """Per-class feature projection after GAP
    (necks/multi_label_projection.py:12-60): one C_in -> C_proj projector
    per class, producing (B, num_classes, C_proj)."""

    num_classes: int
    in_channels: int
    proj_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if x.ndim == 4:
            x = jnp.mean(x, axis=(1, 2))
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.num_classes, self.in_channels, self.proj_channels),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.num_classes, self.proj_channels), jnp.float32)
        return jnp.einsum("bc,ncp->bnp", x.astype(jnp.float32), w) + b


class HRFuseScales(nn.Module):
    """Fuse a multi-scale feature pyramid into one map (necks/hrnet_neck
    HRFuseScales in the reference inventory): each level 1x1-projected to a
    common width, lower-res levels bilinearly upsampled to the finest grid,
    summed, then a 3x3 conv. NHWC."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs) -> Array:
        if not isinstance(xs, (tuple, list)):
            xs = (xs,)
        h, w = xs[0].shape[1], xs[0].shape[2]
        fused = 0.0
        for i, x in enumerate(xs):
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"proj{i}")(x)
            if x.shape[1] != h or x.shape[2] != w:
                x = jax.image.resize(
                    x, (x.shape[0], h, w, x.shape[3]), method="bilinear")
            fused = fused + x
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name="fuse")(fused)


class ChannelMapper(nn.Module):
    """Per-level 1x1 channel projection (necks/channel_mapper.py, commented
    out of the reference's registry but shipped). NHWC tuple in/out."""

    out_channels: int
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        single = not isinstance(xs, (tuple, list))
        if single:
            xs = (xs,)
        ks = (self.kernel_size, self.kernel_size)
        out = tuple(
            nn.Conv(self.out_channels, ks, padding="SAME", dtype=self.dtype,
                    name=f"conv{i}")(x)
            for i, x in enumerate(xs))
        return out[0] if single else out


class FPN(nn.Module):
    """Top-down feature pyramid (necks/fpn.py, dead in the reference's
    registry but shipped): lateral 1x1 projections + upsample-add top-down
    path + per-level 3x3 output convs. NHWC tuple in/out, finest first."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(xs)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                (laterals[i].shape[0],) + laterals[i - 1].shape[1:3]
                + (laterals[i].shape[3],),
                method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name=f"fpn_conv{i}")(lat)
            for i, lat in enumerate(laterals))
