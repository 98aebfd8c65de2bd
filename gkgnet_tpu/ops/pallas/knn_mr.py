"""Fully-fused dynamic graph conv front half: L2-normalize + distance +
top-(k*d) + dilated neighbor gather + max-relative aggregate in ONE Pallas
kernel.

This is the whole "build graph + aggregate" dataflow of MRConv
(torch_edge.py:54-106 + torch_nn.py:84-105 + torch_vertex.py:47-61) without
ever materializing the (BG, N, M) distance matrix or the (BG, N, k, D)
gathered-neighbor tensor in HBM.

The gather is MXU-formulated: the (T, M) one-hot of each selected neighbor
(already produced by the masked-argmin top-k loop) is matmul'd with the raw
target features — dynamic-index gathers (the classic TPU weak spot, SURVEY
hard part #2) never happen. Extra MXU flops (~k gather matmuls vs 1
distance matmul) are the cheap currency on TPU; HBM traffic is the scarce
one.

Gradients: the forward runs fused; the backward recomputes the (sparse,
cheap) gather path with plain XLA ops from the saved edge indices — the
standard recompute-in-bwd pattern (pallas_guide custom-VJP section).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gkgnet_tpu.ops.aggregate import gather_nodes

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# v5e/v5p cores have 128 MiB of physical VMEM; the compiler's default scoped
# limit is 16 MiB. We raise it per-kernel up to this cap (measured: the
# stage-1 label kernel needs ~86 MiB and runs fine).
_VMEM_CAP = 100 * 1024 * 1024


def _scoped_vmem_bytes(tile_t: int, m: int, k: int, dilation: int) -> int:
    """Empirical scoped-VMEM model for the selection loop: the (T, M) fp32
    distance buffer stays live across k*d argmin/where rounds and Mosaic
    allocates roughly one copy per round plus ~4 for iota/mask/onehot
    (matches the compiler's reported 85.91M at T=80, M=20736, k=9).
    +2 rounds of headroom for the transposed-gather buffers
    (row iota (M, T) int32 + one-hot (M, T))."""
    return (k * dilation + 6) * tile_t * m * 4


def fused_fits(n: int, m: int, k: int, dilation: int = 1,
               tile_n: int = 256) -> bool:
    """Whether the fused kernel's scoped VMEM fits on-chip at these shapes
    (callers fall back to the XLA path otherwise)."""
    t = min(tile_n, _round_up(n, 8))
    return _scoped_vmem_bytes(t, m, k, dilation) <= _VMEM_CAP


def _norm_rows(v):
    n = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
    return v / jnp.maximum(n, 1e-12)


def _kernel(x_ref, y_ref, bias_ref, idx_ref, mr_ref, *,
            k: int, dilation: int, m_valid: int, has_bias: bool,
            gather_precision, bf16_inputs: bool):
    """x_ref (1, T, D) raw queries; y_ref (1, M, D) raw targets;
    bias_ref (T, M) or dummy; idx_ref (1, T, k) int32; mr_ref (1, T, D)."""
    x_in = x_ref[0]
    y_in = y_ref[0]
    x_raw = x_in.astype(jnp.float32)
    y_raw = y_in.astype(jnp.float32)
    t, d = x_raw.shape
    m = y_raw.shape[0]

    xn = _norm_rows(x_raw)
    yn = _norm_rows(y_raw)
    if bf16_inputs:
        # XLA-path contract: l2_normalize rounds back to the input dtype
        # (ops/knn.py l2_normalize -> .astype(x.dtype)). On bf16-valued
        # operands a single DEFAULT bf16 MXU pass is BITWISE equal to the
        # fp32 HIGHEST 6-pass dot (products of bf16s are exact in fp32 and
        # the correction passes contribute exact zeros) at 1/6 the MXU work.
        xn = xn.astype(jnp.bfloat16)
        yn = yn.astype(jnp.bfloat16)
        dist_precision = jax.lax.Precision.DEFAULT
    else:
        dist_precision = jax.lax.Precision.HIGHEST  # fp32 distances: bf16
        # MXU passes flip near-tie neighbor ranks vs the XLA reference
    inner = jax.lax.dot_general(
        xn, yn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dist_precision,
    )
    xn32 = xn.astype(jnp.float32)
    yn32 = yn.astype(jnp.float32)
    x_sq = jnp.sum(xn32 * xn32, axis=1, keepdims=True)
    y_sq = jnp.sum(yn32 * yn32, axis=1, keepdims=True)
    dist = x_sq - 2.0 * inner + y_sq.T
    if has_bias:
        dist = dist + bias_ref[...]

    col = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
    big = jnp.float32(jnp.inf)
    dist = jnp.where(col < m_valid, dist, big)

    # gather operands in transposed (D, M) x (M, T) layout: output columns
    # = T (full 128-lane tiles) instead of D=C/groups (=40 at stage 1, which
    # pads to 128 and wastes 3x MXU throughput). Row one-hots make every
    # output element a single exact product, so layout/order is bitwise-free.
    gdtype = jnp.bfloat16 if bf16_inputs else jnp.float32
    y_t = y_in.astype(gdtype).T                                 # (D, M)
    x_t = x_raw.T                                               # (D, T)
    row_m = jax.lax.broadcasted_iota(jnp.int32, (m, t), 0)

    # statically-unrolled k*d rounds: Mosaic lacks dynamic_update_slice for
    # a carried index buffer, and static j makes the dilation stride free
    mr_t = jnp.full((d, t), -jnp.inf, jnp.float32)
    cols = []
    for j in range(k * dilation):
        idx_j = jnp.argmin(dist, axis=1).astype(jnp.int32)       # (T,)
        mask = col == idx_j[:, None]
        if j % dilation == 0:  # strided edge subsample (torch_edge.py:146)
            cols.append(idx_j)
            onehot_t = (row_m == idx_j[None, :]).astype(gdtype)  # (M, T)
            gathered_t = jax.lax.dot_general(                    # (D, T) MXU
                y_t, onehot_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision,
            )
            mr_t = jnp.maximum(mr_t, gathered_t - x_t)
        dist = jnp.where(mask, big, dist)

    idx_ref[0] = jnp.stack(cols, axis=1)
    mr_ref[0] = mr_t.T.astype(mr_ref.dtype)


def _fused_forward(x, y, bias, k, dilation, tile_n, interpret):
    # off-TPU (tests, explicit set_knn_impl('pallas') on CPU) fall back to
    # the interpreter so the fused path stays functional everywhere
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    bg, n, d = x.shape
    m = y.shape[1]
    tile_n = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile_n)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x

    has_bias = bias is not None
    if has_bias:
        bias2 = bias.astype(jnp.float32)
        if n_pad != n:
            bias2 = jnp.pad(bias2, ((0, n_pad - n), (0, 0)))
        bias_spec = pl.BlockSpec((tile_n, m), lambda b, i: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias2 = jnp.zeros((8, 128), jnp.float32)
        bias_spec = pl.BlockSpec((8, 128), lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM)

    # one-hot row gather: with bf16 inputs a single-pass bf16 MXU matmul is
    # EXACT (0/1 one-hot times bf16-representable values, fp32 accumulate)
    # and 6x cheaper than the fp32 HIGHEST 6-pass mode; fp32 inputs keep
    # HIGHEST so gathered values stay bit-exact (measured: 81.5 -> 44 ms at
    # stage-1 shapes, indices bitwise identical).
    bf16_inputs = x.dtype == jnp.bfloat16 and y.dtype == jnp.bfloat16
    gather_precision = (jax.lax.Precision.DEFAULT if bf16_inputs
                        else jax.lax.Precision.HIGHEST)
    vmem_limit = min(_VMEM_CAP,
                     max(16 * 1024 * 1024,
                         int(_scoped_vmem_bytes(tile_n, m, k, dilation) * 1.4)))

    kd = k * dilation
    idx, mr = pl.pallas_call(
        functools.partial(_kernel, k=k, dilation=dilation, m_valid=m,
                          has_bias=has_bias,
                          gather_precision=gather_precision,
                          bf16_inputs=bf16_inputs),
        grid=(bg, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, n_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((bg, n_pad, d), x.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bg * n_pad * m * d * (1 + k) + 3 * kd * bg * n_pad * m,
            bytes_accessed=bg * (2 * n_pad * d + m * d) * 4 + n_pad * m * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(xp, y, bias2)
    if n_pad != n:
        idx, mr = idx[:, :n], mr[:, :n]
    return idx, mr


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def knn_mr_fused(x: Array, y: Array, bias: Array | None, k: int,
                 dilation: int = 1, tile_n: int = 256,
                 interpret: bool = False):
    """Fused kNN-graph + max-relative aggregate.

    Args:
      x: (BG, N, D) raw (un-normalized) query/center features.
      y: (BG, M, D) raw target features.
      bias: optional (N, M) distance bias.
    Returns:
      (idx (BG, N, k) int32, maxrel (BG, N, D)).
    """
    return _fused_forward(x, y, bias, k, dilation, tile_n, interpret)


def _mr_from_idx(x, y, idx):
    x_j = gather_nodes(y, idx)
    return jnp.max(x_j - x[:, :, None, :], axis=2)


def _fwd(x, y, bias, k, dilation, tile_n, interpret):
    idx, mr = _fused_forward(x, y, bias, k, dilation, tile_n, interpret)
    return (idx, mr), (x, y, idx)


def _bwd(k, dilation, tile_n, interpret, res, g):
    x, y, idx = res
    _, g_mr = g  # idx output is integer: no gradient
    # recompute the (cheap) gather path and differentiate it with XLA; the
    # graph build itself is non-differentiable (stop_gradient semantics,
    # torch_edge.py:17)
    _, vjp = jax.vjp(lambda x_, y_: _mr_from_idx(x_, y_, idx), x, y)
    gx, gy = vjp(g_mr)
    return gx, gy, None


knn_mr_fused.defvjp(_fwd, _bwd)
