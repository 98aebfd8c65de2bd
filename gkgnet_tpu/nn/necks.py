"""Necks (reference mmcls/models/necks — registered for API completeness;
the live GKGNet config uses ``neck=None`` with GAP inline in the backbone,
gkgnet.py:243,278)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


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
