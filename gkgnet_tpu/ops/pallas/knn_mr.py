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
# limit is 16 MiB. We raise it per-kernel up to this cap.
_VMEM_CAP = 100 * 1024 * 1024


def _scoped_vmem_bytes(tile_t: int, m: int, k: int, dilation: int,
                       d: int = 0, itembytes: int = 4) -> int:
    """Scoped-VMEM model. The (T, M) fp32 distance matrix lives in ONE
    explicit VMEM scratch buffer that the selection loop masks in place and
    the selection rounds run under fori_loop, so the (T, M)-sized footprint
    is the scratch + ~3 transient temporaries (iota, where-result, one-hot)
    — independent of k*d. (Pre-scratch/fori_loop, Mosaic kept one SSA copy
    of the functional `dist` live per statically-unrolled round: (k*d+6)
    copies — which is what used to push the stage-1 label kernel past the
    cap and silently degrade it to XLA.) (T, M)-sized live values: dist
    scratch, col iota, the distance matmul result, the bool mask + its
    gather-dtype cast, the where temporary, plus pipeline slack — measured
    54.55M at T=80, M=20736 bf16 = ~8.2 fp32 copies; the (double-buffered)
    target tile (M, D) is modeled explicitly."""
    del k, dilation
    return int(8.5 * tile_t * m * 4) + 2 * m * d * itembytes


def fused_fits(n: int, m: int, k: int, dilation: int = 1,
               tile_n: int = 256, d: int = 0, itembytes: int = 4) -> bool:
    """Whether the fused kernel's scoped VMEM fits on-chip at these shapes
    (callers fall back to the XLA path otherwise)."""
    t = min(tile_n, _round_up(n, 8))
    return _scoped_vmem_bytes(t, m, k, dilation, d, itembytes) <= _VMEM_CAP


def _norm_rows(v):
    n = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
    return v / jnp.maximum(n, 1e-12)


def _kernel(x_ref, y_ref, bias_ref, idx_ref, mr_ref, dist_ref, mrt_ref, *,
            k: int, dilation: int, m_valid: int, has_bias: bool,
            gather_precision, bf16_inputs: bool, batched_bias: bool = False):
    """x_ref (1, T, D) raw queries; y_ref (1, M, D) raw targets;
    bias_ref (T, M) or dummy; idx_ref (1, T, k) int32; mr_ref (1, T, D);
    dist_ref (T, M) fp32 VMEM scratch masked in place by the selection
    loop; mrt_ref (D, T) fp32 scratch for the transposed max-relative
    accumulator. All selection state lives in scratch refs and the rounds
    run under ``fori_loop`` — one shared buffer set, so scoped VMEM is
    O(T*M) instead of the O(k*d*T*M) a static unroll costs (Mosaic keeps
    every unrolled round's SSA copy live on the stack)."""
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
        dist = dist + (bias_ref[0] if batched_bias else bias_ref[...])

    col = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
    big = jnp.float32(jnp.inf)
    dist_ref[...] = jnp.where(col < m_valid, dist, big)

    # The (T, M) selection mask doubles as the gather one-hot:
    # dot_general(mask (T, M), y (M, D)) -> (T, D) picks each query's
    # selected neighbor row on the MXU. Row one-hots make every output
    # element a single exact product, so layout/order is bitwise-free, and
    # reusing the mask avoids a second (M, T) iota/one-hot buffer and any
    # explicit transposes (a hoisted ``y.T`` trips a Mosaic dead-transpose
    # RET_CHECK when its only uses sit inside the predicated loop body).
    gdtype = jnp.bfloat16 if bf16_inputs else jnp.float32
    y_gd = y_in.astype(gdtype)                                  # (M, D)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)

    mrt_ref[...] = jnp.full((t, d), -jnp.inf, jnp.float32)
    idx_ref[0] = jnp.zeros((t, k), jnp.int32)

    def gather_update(j, idx_j, mask):
        sel = j // dilation if dilation > 1 else j
        idx_ref[0] = jnp.where(lane_k == sel, idx_j[:, None], idx_ref[0])
        gathered = jax.lax.dot_general(                          # (T, D) MXU
            mask.astype(gdtype), y_gd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gather_precision,
        )
        mrt_ref[...] = jnp.maximum(mrt_ref[...], gathered - x_raw)

    bigc = jnp.int32(1 << 30)

    def round_body(j, _):
        # min + lexicographic column extraction (NOT jnp.argmin: Mosaic's
        # argmin lowering does not guarantee the first-occurrence tie order
        # lax.top_k uses — observed index flips on bitwise-equal distances)
        dist = dist_ref[...]
        gv = jnp.min(dist, axis=1)                               # (T,)
        eq = dist == gv[:, None]                                 # (T, M)
        idx_j = jnp.min(jnp.where(eq, col, bigc), axis=1).astype(jnp.int32)
        mask = col == idx_j[:, None]                             # (T, M)

        if dilation > 1:
            @pl.when(j % dilation == 0)  # strided subsample (torch_edge.py:146)
            def _():
                gather_update(j, idx_j, mask)
        else:
            gather_update(j, idx_j, mask)

        @pl.when(j != k * dilation - 1)
        def _():
            dist_ref[...] = jnp.where(mask, big, dist)

        return 0

    jax.lax.fori_loop(0, k * dilation, round_body, 0)
    mr_ref[0] = mrt_ref[...].astype(mr_ref.dtype)


def _cache_depth(kd: int) -> int:
    """Per-lane cache depth for the foldc selector: deep enough that a
    lane-class overflow (> C of the global top-k*d sharing one column class
    mod 128) is rare. P(row overflows) ~ C(kd, C+1)/128^C: kd=9,C=2 ->
    0.5%; kd=18,C=3 -> 0.15%; kd=27,C=4 -> 0.03%. Overflowed rows are
    flagged and exactly recomputed by the repair epilogue."""
    if kd <= 9:
        return 2
    if kd <= 18:
        return 3
    return 4


def _kernel_foldc(x_ref, y_ref, bias_ref, idx_ref, mr_ref, flag_ref,
                  dist_ref, mrt_ref, mv_ref, mc_ref, bnd_ref, used_ref,
                  flg_ref, *,
                  k: int, dilation: int, m_valid: int, has_bias: bool,
                  gather_precision, bf16_inputs: bool, cache_c: int):
    """foldc selection: top-(k*d) via a per-lane-class sorted top-C cache
    plus per-row exactness flags (NO in-kernel refold).

    The masked-argmin loop costs ~5.5 VPU ops/element/round over the full
    (T, M) tile — k*d rescans of M candidates. Here the (T, M) distance
    matrix is folded ONCE into a per-lane-class cache: for each of the 128
    lane classes (columns mod 128), the C smallest (value, global col)
    pairs across the R = M/128 column tiles in (value, col)-lex order,
    plus the (C+1)-th smallest VALUE as a bound. Each of the k*d selection
    rounds then runs on (T, 128) data only: pick the global (value, col)
    lex-min over per-lane cache heads, consume it from its lane.

    Exactness without refolds: a row's result can only be wrong if some
    lane's cache is exhausted (used == C) while its bound says a hidden
    (C+1)-th candidate could still win: bound <= current winner value.
    That row is FLAGGED (conservative) and the caller's repair epilogue
    recomputes it exactly with the argmin kernel on a compacted row set;
    per-row flags avoid fold2's fatal flaw (a tile-global refold trigger
    fires almost every round once T*P(row) ~ 1, serializing full-tile
    refolds — measured 0.63x vs argmin).

    Tie order: candidates are folded in ascending-column order (strict '<'
    vs the arriving element, full (value, col) lex for displaced carries),
    and the cross-lane pick minimizes (value, col) — the torch.topk /
    lax.top_k first-occurrence order, bitwise.

    Scratch: dist (T, Mp) fp32 (Mp = M rounded up to 128); mv (T, C*128)
    fp32 + mc (T, C*128) int32 slot caches; bnd (T, 128) fp32 (C+1)-th
    value; used (T, 128) int32 consume counts; flg (T, 128) int32.
    """
    x_in = x_ref[0]
    y_in = y_ref[0]
    x_raw = x_in.astype(jnp.float32)
    t, d = x_raw.shape
    m_pad = y_in.shape[0]
    kd = k * dilation
    big = jnp.float32(jnp.inf)
    bigc = jnp.int32(1 << 30)

    xn = _norm_rows(x_raw)
    yn = _norm_rows(y_in.astype(jnp.float32))
    if bf16_inputs:
        xn = xn.astype(jnp.bfloat16)
        yn = yn.astype(jnp.bfloat16)
        dist_precision = jax.lax.Precision.DEFAULT
    else:
        dist_precision = jax.lax.Precision.HIGHEST
    inner = jax.lax.dot_general(
        xn, yn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=dist_precision)
    xn32 = xn.astype(jnp.float32)
    yn32 = yn.astype(jnp.float32)
    x_sq = jnp.sum(xn32 * xn32, axis=1, keepdims=True)
    y_sq = jnp.sum(yn32 * yn32, axis=1, keepdims=True)
    dist = x_sq - 2.0 * inner + y_sq.T                        # (T, Mp)
    if has_bias:
        dist = dist + bias_ref[...]
    col_m = jax.lax.broadcasted_iota(jnp.int32, (t, m_pad), 1)
    dist_ref[...] = jnp.where(col_m < m_valid, dist, big)

    r_tiles = m_pad // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    col_pad = jax.lax.broadcasted_iota(jnp.int32, (t, m_pad), 1)

    gdtype = jnp.bfloat16 if bf16_inputs else jnp.float32
    y_gd = y_in.astype(gdtype)                                # (M, D)

    # ---- fold: one pass over the R column tiles -------------------------
    dd = dist_ref[...]
    mv = [jnp.full((t, 128), big) for _ in range(cache_c)]
    mc = [jnp.zeros((t, 128), jnp.int32) for _ in range(cache_c)]
    bnd = jnp.full((t, 128), big)
    for r in range(r_tiles):
        cv = dd[:, r * 128:(r + 1) * 128]
        cc = lane128 + r * 128
        for s in range(cache_c):
            if s == 0:
                # the arriving element's col exceeds every cached col in
                # its lane (ascending-col arrival): strict '<' keeps
                # first-occurrence tie order
                b = cv < mv[s]
            else:
                # displaced carries need the full (value, col) lex compare
                b = (cv < mv[s]) | ((cv == mv[s]) & (cc < mc[s]))
            nv = jnp.where(b, cv, mv[s])
            nc = jnp.where(b, cc, mc[s])
            cv = jnp.where(b, mv[s], cv)
            cc = jnp.where(b, mc[s], cc)
            mv[s], mc[s] = nv, nc
        bnd = jnp.minimum(bnd, cv)
    for s in range(cache_c):
        mv_ref[:, s * 128:(s + 1) * 128] = mv[s]
        mc_ref[:, s * 128:(s + 1) * 128] = mc[s]
    bnd_ref[...] = bnd
    used_ref[...] = jnp.zeros((t, 128), jnp.int32)
    flg_ref[...] = jnp.zeros((t, 128), jnp.int32)

    mrt_ref[...] = jnp.full((t, d), -jnp.inf, jnp.float32)
    idx_ref[0] = jnp.zeros((t, k), jnp.int32)

    def gather_update(j, gc):
        sel = j // dilation if dilation > 1 else j
        idx_ref[0] = jnp.where(lane_k == sel, gc[:, None], idx_ref[0])
        mask = col_pad == gc[:, None]                         # (T, Mp)
        gathered = jax.lax.dot_general(                       # (T, D) MXU
            mask.astype(gdtype), y_gd,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=gather_precision)
        mrt_ref[...] = jnp.maximum(mrt_ref[...], gathered - x_raw)

    def round_body(j, _):
        used = used_ref[...]
        eff_v = jnp.full((t, 128), big)
        eff_c = jnp.zeros((t, 128), jnp.int32)
        for s in reversed(range(cache_c)):
            is_s = used == s
            eff_v = jnp.where(is_s, mv_ref[:, s * 128:(s + 1) * 128], eff_v)
            eff_c = jnp.where(is_s, mc_ref[:, s * 128:(s + 1) * 128], eff_c)
        gv = jnp.min(eff_v, axis=1)                           # (T,)
        gc = jnp.min(jnp.where(eff_v == gv[:, None], eff_c, bigc),
                     axis=1).astype(jnp.int32)                # (T,) lex
        win = (eff_v == gv[:, None]) & (eff_c == gc[:, None])
        # exactness check BEFORE consuming: an exhausted lane whose
        # (C+1)-th-value bound could beat (or lex-tie) the winner means a
        # hidden candidate may exist -> flag the row. +inf bound (no
        # exhausted lane, or a lane class with <= C real candidates) never
        # flags: inf <= inf is filtered by the isfinite guard.
        bmin = jnp.min(jnp.where(used >= cache_c, bnd_ref[...], big),
                       axis=1)                                # (T,)
        stale = (bmin <= gv) & jnp.isfinite(bmin)
        flg_ref[...] = flg_ref[...] | stale[:, None].astype(jnp.int32)
        used_ref[...] = used + win.astype(jnp.int32)

        if dilation > 1:
            @pl.when(j % dilation == 0)
            def _():
                gather_update(j, gc)
        else:
            gather_update(j, gc)
        return 0

    jax.lax.fori_loop(0, kd, round_body, 0)
    mr_ref[0] = mrt_ref[...].astype(mr_ref.dtype)
    flag_ref[0] = flg_ref[:, :1]


# selection algorithm for the fused kernel:
#   'auto'   — foldc when the target axis is large enough to amortize the
#              fold (M >= 1024), argmin otherwise
#   'argmin' — masked min + lex column extraction over the full (T, M)
#              tile every round
#   'foldc'  — per-lane-class sorted top-C cache + flagged-row repair
_MR_SELECTOR = "auto"


def set_mr_selector(name: str):
    global _MR_SELECTOR
    assert name in ("auto", "argmin", "foldc"), name
    _MR_SELECTOR = name


def _use_foldc(m: int) -> bool:
    if _MR_SELECTOR == "auto":
        return m >= 1024
    return _MR_SELECTOR == "foldc"


def _run_pallas(x, y, bias, k, dilation, tile_n, interpret, selector):
    """One pallas_call of the fused kernel. ``bias`` may be (N, M) shared
    or (BG, N, M) batched (the repair pass gathers per-row bias slices).
    Returns (idx, mr) for 'argmin', (idx, mr, flags (BG, N) int32) for
    'foldc'."""
    bg, n, d = x.shape
    m = y.shape[1]
    tile_n = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile_n)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x

    foldc = selector == "foldc"
    # the lane-class fold tiles the target axis in 128-lane classes: pad
    # targets/bias to a 128 multiple, mask with m_valid inside
    m_blk = _round_up(m, 128) if foldc else m
    if m_blk != m:
        y = jnp.pad(y, ((0, 0), (0, m_blk - m), (0, 0)))

    has_bias = bias is not None
    batched_bias = has_bias and bias.ndim == 3
    if has_bias:
        bias2 = bias.astype(jnp.float32)
        pad_n = n_pad - (bias2.shape[-2])
        if pad_n or m_blk != m:
            widths = ((0, pad_n), (0, m_blk - m))
            if batched_bias:
                widths = ((0, 0),) + widths
            bias2 = jnp.pad(bias2, widths)
        if batched_bias:
            bias_spec = pl.BlockSpec((1, tile_n, m_blk),
                                     lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM)
        else:
            bias_spec = pl.BlockSpec((tile_n, m_blk), lambda b, i: (i, 0),
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
    itembytes = 2 if bf16_inputs else 4
    vmem_limit = min(_VMEM_CAP,
                     max(16 * 1024 * 1024,
                         int(_scoped_vmem_bytes(tile_n, m_blk, k, dilation,
                                                d, itembytes) * 1.25)
                         + 2 * 1024 * 1024))

    kd = k * dilation
    out_specs = [
        pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bg, n_pad, k), jnp.int32),
        jax.ShapeDtypeStruct((bg, n_pad, d), x.dtype),
    ]
    if foldc:
        c = _cache_depth(kd)
        kern = functools.partial(_kernel_foldc, cache_c=c)
        scratch = [pltpu.VMEM((tile_n, m_blk), jnp.float32),
                   pltpu.VMEM((tile_n, d), jnp.float32),
                   pltpu.VMEM((tile_n, c * 128), jnp.float32),
                   pltpu.VMEM((tile_n, c * 128), jnp.int32),
                   pltpu.VMEM((tile_n, 128), jnp.float32),
                   pltpu.VMEM((tile_n, 128), jnp.int32),
                   pltpu.VMEM((tile_n, 128), jnp.int32)]
        out_specs.append(pl.BlockSpec((1, tile_n, 1), lambda b, i: (b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bg, n_pad, 1), jnp.int32))
    else:
        kern = functools.partial(_kernel, batched_bias=batched_bias)
        scratch = [pltpu.VMEM((tile_n, m), jnp.float32),
                   pltpu.VMEM((tile_n, d), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(kern, k=k, dilation=dilation, m_valid=m,
                          has_bias=has_bias,
                          gather_precision=gather_precision,
                          bf16_inputs=bf16_inputs),
        grid=(bg, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_blk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bg * n_pad * m * d * (1 + k) + 3 * kd * bg * n_pad * m,
            bytes_accessed=bg * (2 * n_pad * d + m * d) * 4 + n_pad * m * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(xp, y, bias2)
    idx, mr = outs[0], outs[1]
    if n_pad != n:
        idx, mr = idx[:, :n], mr[:, :n]
    if foldc:
        flags = outs[2][:, :n, 0] if n_pad != n else outs[2][..., 0]
        return idx, mr, flags
    return idx, mr


def _repair_cap(n: int) -> int:
    """Static row capacity of the repair pass: generous vs the expected
    flag rate (<~0.5% of rows), tiny vs a full recompute."""
    return min(_round_up(n, 8), max(128, _round_up(n // 32, 128)))


def _fused_forward(x, y, bias, k, dilation, tile_n, interpret):
    # off-TPU (tests, explicit set_knn_impl('pallas') on CPU) fall back to
    # the interpreter so the fused path stays functional everywhere
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    bg, n, d = x.shape
    m = y.shape[1]
    if not _use_foldc(m):
        return _run_pallas(x, y, bias, k, dilation, tile_n, interpret,
                           "argmin")

    idx, mr, flags = _run_pallas(x, y, bias, k, dilation, tile_n, interpret,
                                 "foldc")
    cap = _repair_cap(n)
    cnt = jnp.sum(flags, axis=1)                              # (BG,)

    def full_recompute(_):
        return _run_pallas(x, y, bias, k, dilation, tile_n, interpret,
                           "argmin")

    def repair(_):
        # exact recompute of just the flagged rows, compacted per batch
        # element (static cap), with the argmin kernel; out-of-range fill
        # rows are dropped by the scatter.
        rows = jax.vmap(
            lambda f: jnp.nonzero(f, size=cap, fill_value=n)[0])(flags)
        valid = jax.lax.broadcasted_iota(
            jnp.int32, (bg, cap), 1) < cnt[:, None]
        rows_g = jnp.where(valid, rows, 0)
        xg = jnp.take_along_axis(x, rows_g[..., None], axis=1)
        bias_g = None
        if bias is not None:
            b3 = bias[None] if bias.ndim == 2 else bias
            if b3.shape[0] == 1:
                bias_g = b3[0][rows_g]                        # (BG, cap, M)
            else:
                bias_g = jnp.take_along_axis(
                    b3, rows_g[..., None], axis=1)
        idx_r, mr_r = _run_pallas(xg, y, bias_g, k, dilation, tile_n,
                                  interpret, "argmin")
        rows_s = jnp.where(valid, rows, n)  # out of range -> dropped
        idx2 = jax.vmap(
            lambda a, r, v: a.at[r].set(v, mode="drop"))(idx, rows_s, idx_r)
        mr2 = jax.vmap(
            lambda a, r, v: a.at[r].set(v, mode="drop"))(mr, rows_s, mr_r)
        return idx2, mr2

    # adversarially tie-heavy inputs can flag more rows than the repair
    # capacity: recompute everything exactly with the argmin kernel then
    # (never on real feature data; exactness is unconditional either way)
    return jax.lax.cond(jnp.max(cnt) > cap, full_recompute, repair, None)


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
