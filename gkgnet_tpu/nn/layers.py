"""Basic layers (flax.linen), torch-parity where it matters for checkpoint
import and per-layer allclose:

  * ``BatchNorm`` — torch semantics: biased variance for normalization,
    *unbiased* variance into the running stats, ``new = (1-m)*old + m*batch``
    with momentum 0.1, eps 1e-5. Under ``pjit`` data parallelism the batch
    axis is globally sharded and ``jnp.mean`` reduces over the *global*
    batch, so this is SyncBN (reference: SyncBN on every norm,
    gkgnet.py:23, torch_nn.py:8) with zero extra code; an ``axis_name`` is
    accepted for explicit shard_map/pmap use.
  * ``PointwiseConv`` — 1x1 convolution as a (grouped) matmul over the last
    axis; the reference's BasicConv uses groups=4 (torch_nn.py:61).
  * ``Activation`` — exact-erf GELU (torch ``nn.GELU`` default), prelu has a
    learnable parameter.
  * ``DropPath`` — per-sample stochastic depth (timm semantics: scale by
    1/keep_prob at train time).
  * ``Stem``/``Downsample``/``FFN`` — gkgnet.py:46-118, NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class BatchNorm(nn.Module):
    """Batch normalization over all axes but the last, torch semantics."""

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            mean_sq = jnp.mean(jnp.square(x32), axis=axes)
            count = 1
            for a in axes:
                count *= x.shape[a]
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                count *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (count / max(count - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype)


class Activation(nn.Module):
    """relu / leakyrelu / prelu / gelu / hswish (torch_nn.py:13-29)."""

    act: str = "relu"
    neg_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = self.act.lower()
        if act == "relu":
            return jax.nn.relu(x)
        if act == "leakyrelu":
            return jax.nn.leaky_relu(x, self.neg_slope)
        if act == "prelu":
            alpha = self.param(
                "alpha", nn.initializers.constant(self.neg_slope), (1,), jnp.float32
            ).astype(x.dtype)
            return jnp.where(x >= 0, x, alpha * x)
        if act == "gelu":
            return jax.nn.gelu(x, approximate=False)
        if act == "hswish":
            return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
        raise NotImplementedError(f"activation [{act}] is not found")


class PointwiseConv(nn.Module):
    """1x1 convolution over the channel (last) axis as a grouped matmul."""

    features: int
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        g = self.groups
        if cin % g or self.features % g:
            raise ValueError(f"channels ({cin}->{self.features}) not divisible by groups={g}")
        kernel = self.param(
            "kernel", kaiming_normal, (g, cin // g, self.features // g), jnp.float32
        ).astype(self.dtype)
        # Flatten every leading dim into one row axis: XLA lowers a clean
        # 2D (g=1) / 3D-batched (g>1) dot instead of threading a dummy
        # group dim through a 5D tensor — the round-5 trace showed the 5D
        # form picking a bad layout ((B,H,W,1,4C) with the size-1 dim
        # major) and costing ~1 ms per FFN conv at stage-1 geometry.
        lead = x.shape[:-1]
        if g == 1:
            y = x.reshape(-1, cin).astype(self.dtype) @ kernel[0]
        else:
            xg = x.reshape(-1, g, cin // g).astype(self.dtype)
            y = jnp.einsum("ngi,gio->ngo", xg, kernel)
        y = y.reshape(*lead, self.features)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(self.dtype)
            y = y + bias
        return y


class DropPath(nn.Module):
    """Per-sample stochastic depth on the residual branch."""

    rate: float = 0.0
    rng_collection: str = "droppath"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng(self.rng_collection)
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class BasicConv(nn.Module):
    """[1x1 grouped conv -> BN -> act] stack (torch_nn.py:57-69; groups=4)."""

    channels: Sequence[int]
    act: str | None = "relu"
    norm: str | None = None
    use_bias: bool = True
    groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        for i, features in enumerate(self.channels[1:]):
            x = PointwiseConv(
                features, groups=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            if self.norm is not None and self.norm.lower() != "none":
                x = BatchNorm(dtype=self.dtype, name=f"norm{i}")(
                    x, use_running_average=not train
                )
            if self.act is not None and self.act.lower() != "none":
                x = Activation(self.act, name=f"act{i}")(x)
        return x


class ConvNorm(nn.Module):
    """conv1x1 (ungrouped) + BN — the Grapher/FFN fc blocks."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = PointwiseConv(self.features, dtype=self.dtype, name="conv")(x)
        return BatchNorm(dtype=self.dtype, name="norm")(x, use_running_average=not train)


class FFN(nn.Module):
    """fc1 -> act -> fc2 with BN after each conv, DropPath residual
    (gkgnet.py:46-72; FFNLabel is the same shape, torch_vertex.py:334-360)."""

    hidden_features: int
    out_features: int
    act: str = "relu"
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        shortcut = x
        x = ConvNorm(self.hidden_features, dtype=self.dtype, name="fc1")(x, train)
        x = Activation(self.act, name="act")(x)
        x = ConvNorm(self.out_features, dtype=self.dtype, name="fc2")(x, train)
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic=not train)
        return x + shortcut


def conv3x3(features: int, stride: int, dtype, name: str) -> nn.Conv:
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
        kernel_init=kaiming_normal, dtype=dtype, name=name,
    )


class Stem(nn.Module):
    """Image -> stride-4 patch grid: 3 convs with BN+act between
    (gkgnet.py:74-100). NHWC."""

    out_dim: int
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = conv3x3(self.out_dim // 2, 2, self.dtype, "conv0")(x.astype(self.dtype))
        x = BatchNorm(dtype=self.dtype, name="norm0")(x, use_running_average=not train)
        x = Activation(self.act, name="act0")(x)
        x = conv3x3(self.out_dim, 2, self.dtype, "conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="norm1")(x, use_running_average=not train)
        x = Activation(self.act, name="act1")(x)
        x = conv3x3(self.out_dim, 1, self.dtype, "conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="norm2")(x, use_running_average=not train)
        return x


class Downsample(nn.Module):
    """3x3 stride-2 conv + BN between stages (gkgnet.py:103-118)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = conv3x3(self.out_dim, 2, self.dtype, "conv")(x)
        return BatchNorm(dtype=self.dtype, name="norm")(x, use_running_average=not train)


def avg_pool_nhwc(x: Array, r: int) -> Array:
    """Non-overlapping r x r average pooling (torch F.avg_pool2d(x, r, r))."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return jnp.mean(x, axis=(2, 4))
