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
    """Scoped-VMEM model for the masked-argmin kernel. The (T, M) fp32
    distance matrix lives in ONE explicit VMEM scratch buffer that the
    selection loop masks in place and the selection rounds run under
    fori_loop, so the (T, M)-sized footprint is the scratch + ~3 transient
    temporaries (iota, where-result, one-hot) — independent of k*d.
    (Pre-scratch/fori_loop, Mosaic kept one SSA copy of the functional
    `dist` live per statically-unrolled round: (k*d+6) copies — which is
    what used to push the stage-1 label kernel past the cap and silently
    degrade it to XLA.) (T, M)-sized live values: dist scratch, col iota,
    the distance matmul result, the bool mask + its gather-dtype cast, the
    where temporary, plus pipeline slack — measured 54.55M at T=80,
    M=20736 bf16 = ~8.2 fp32 copies; the (double-buffered) target tile
    (M, D) is modeled explicitly."""
    del k, dilation
    return int(8.5 * tile_t * m * 4) + 2 * m * d * itembytes


def _scoped_vmem_bytes_foldv(tile_t: int, m_pad: int, cache_c: int,
                             d: int = 0, itembytes: int = 4) -> int:
    """Scoped-VMEM model for the foldv kernel. The round loop streams the
    eq-compare/gather in 4096-column chunks, so its transients are bounded;
    the binding term is the exact argmin EPILOGUE, which keeps ~4 full
    (T, M) fp32 values live (dist scratch + read copy + where temporaries)
    — measured 57.7M at T=80, M=20736 pre-chunking (~8.7 copies) with the
    unchunked round loop as the peak."""
    big = 7.0 * 4 * tile_t * m_pad
    small = (cache_c + 6) * 128 * tile_t * 4 + 3 * tile_t * d * 4 \
        + 3 * tile_t * min(m_pad, 4096) * 4
    return int(big) + small + 2 * m_pad * d * itembytes + m_pad * 32


def _pick_tile(n: int, tile_n: int = 256) -> int:
    """Waste-free query tiling. Every padded row costs the same VMEM
    touches as a real one, so prefer (a) a single slightly-larger tile
    when n is barely above tile_n (stage4: 324 -> one 328-row tile, not
    2x256 = 512 rows), and (b) an exact divisor of n just below tile_n
    (stage3: 1296 -> 6x216 exact, not 6x256 = 1536 rows, -16%). The r4
    tile sweep showed 128 is 35-41% slower and 512+ slower still, so the
    divisor search stays within [tile_n-64, tile_n]."""
    n8 = _round_up(n, 8)
    if n8 <= tile_n + tile_n // 2:
        return n8
    if n % tile_n == 0:
        return tile_n
    for t in range(tile_n - 8, tile_n - 64 - 1, -8):
        if n % t == 0:
            return t
    return tile_n


def fused_fits(n: int, m: int, k: int, dilation: int = 1,
               tile_n: int = 256, d: int = 0, itembytes: int = 4) -> bool:
    """Whether the fused kernel's scoped VMEM fits on-chip at these shapes
    (callers fall back to the XLA path otherwise)."""
    t = _pick_tile(n, tile_n)
    if _use_foldv(m):
        return _scoped_vmem_bytes_foldv(
            t, _round_up(m, 128), _cache_depth(k * dilation), d,
            itembytes) <= _VMEM_CAP
    return _scoped_vmem_bytes(t, m, k, dilation, d, itembytes) <= _VMEM_CAP


def _norm_rows(v):
    n = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
    return v / jnp.maximum(n, 1e-12)


def _kernel(x_ref, y_ref, bias_ref, idx_ref, mr_ref, dist_ref, mrt_ref, *,
            k: int, dilation: int, m_valid: int, has_bias: bool,
            gather_precision, bf16_inputs: bool, batched_bias: bool = False,
            groups: int = 1):
    """x_ref (1, T, D) raw queries; y_ref (1, M, D) raw targets;
    bias_ref (T, M) or dummy; idx_ref (1, T, k) int32; mr_ref (1, T, D);
    dist_ref (T, M) fp32 VMEM scratch masked in place by the selection
    loop; mrt_ref (D, T) fp32 scratch for the transposed max-relative
    accumulator. All selection state lives in scratch refs and the rounds
    run under ``fori_loop`` — one shared buffer set, so scoped VMEM is
    O(T*M) instead of the O(k*d*T*M) a static unroll costs (Mosaic keeps
    every unrolled round's SSA copy live on the stack).

    ``groups > 1`` (fold-aware path): the refs carry ALL groups'
    channels — x (1, T, g*D), y (1, M, g*D), idx (1, T, g*k),
    mr (1, T, g*D) — and a STATIC python loop runs the selection once
    per group on static channel slices, reusing the same scratch. Block
    last-dims equal the full array dims, which is what Mosaic requires
    (a per-group channel-sliced BlockSpec with D=40..320 is not
    128-divisible and fails to lower)."""
    for gi in range(groups):
        _kernel_one_group(x_ref, y_ref, bias_ref, idx_ref, mr_ref,
                          dist_ref, mrt_ref, gi=gi, groups=groups, k=k,
                          dilation=dilation, m_valid=m_valid,
                          has_bias=has_bias,
                          gather_precision=gather_precision,
                          bf16_inputs=bf16_inputs,
                          batched_bias=batched_bias)


def _kernel_one_group(x_ref, y_ref, bias_ref, idx_ref, mr_ref, dist_ref,
                      mrt_ref, *, gi: int, groups: int, k: int,
                      dilation: int, m_valid: int, has_bias: bool,
                      gather_precision, bf16_inputs: bool,
                      batched_bias: bool):
    if groups == 1:
        x_in = x_ref[0]
        y_in = y_ref[0]
    else:
        dg = x_ref.shape[2] // groups
        x_in = x_ref[0][:, gi * dg:(gi + 1) * dg]
        y_in = y_ref[0][:, gi * dg:(gi + 1) * dg]
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
    k0 = gi * k
    idx_ref[0, :, k0:k0 + k] = jnp.zeros((t, k), jnp.int32)

    def gather_update(j, idx_j, mask):
        sel = j // dilation if dilation > 1 else j
        idx_ref[0, :, k0:k0 + k] = jnp.where(
            lane_k == sel, idx_j[:, None], idx_ref[0, :, k0:k0 + k])
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
    d0 = gi * d
    mr_ref[0, :, d0:d0 + d] = mrt_ref[...].astype(mr_ref.dtype)


def _cache_depth(kd: int) -> int:
    """Per-lane cache depth for the foldv selector. A row falls back to the
    exact in-kernel epilogue only when > C of its global top-k*d share one
    column class mod 128 AND the hidden candidate is strictly smaller than
    a popped value (ties are resolved in-round since round 4); the epilogue
    reruns the whole TILE, so the depth is sized for a low *tile* rate:
    P(row) ~ C(kd, C+1)/128^C -> kd=9,C=3: 6e-5; kd=18,C=4: 3e-5;
    kd=27,C=5: 9e-6 (x256 rows/tile: ~2%, ~1%, ~0.2%). Real node grids
    collide far less: spatial neighbors sit in distinct lane classes
    (adjacent columns / +-grid-width offsets mod 128)."""
    if kd <= 9:
        return 3
    if kd <= 18:
        return 4
    return 5


def _kernel_foldv(x_ref, y_ref, bias_ref, idx_ref, mr_ref,
                  dist_ref, mrt_ref, mv_ref, bnd_ref, hd_ref, used_ref,
                  flg_ref, pend_ref, *,
                  k: int, dilation: int, m_valid: int, has_bias: bool,
                  gather_precision, bf16_inputs: bool, cache_c: int,
                  batched_bias: bool = False, groups: int = 1):
    """Static group loop over `_kernel_foldv_one_group` (see `_kernel`
    for the fold-aware groups>1 block layout: full-channel blocks +
    static channel slices — the Mosaic-legal formulation)."""
    for gi in range(groups):
        _kernel_foldv_one_group(
            x_ref, y_ref, bias_ref, idx_ref, mr_ref, dist_ref, mrt_ref,
            mv_ref, bnd_ref, hd_ref, used_ref, flg_ref, pend_ref, gi=gi,
            groups=groups, k=k, dilation=dilation, m_valid=m_valid,
            has_bias=has_bias, gather_precision=gather_precision,
            bf16_inputs=bf16_inputs, cache_c=cache_c,
            batched_bias=batched_bias)


def _kernel_foldv_one_group(x_ref, y_ref, bias_ref, idx_ref, mr_ref,
                            dist_ref, mrt_ref, mv_ref, bnd_ref, hd_ref,
                            used_ref, flg_ref, pend_ref, *, gi: int,
                            groups: int, k: int, dilation: int,
                            m_valid: int, has_bias: bool,
                            gather_precision, bf16_inputs: bool,
                            cache_c: int, batched_bias: bool):
    """foldv selection: values-only per-lane-class sorted top-C cache, with
    winner columns recovered by an equality compare against the retained
    distance matrix, and an exact in-kernel argmin epilogue for flagged
    tiles.

    Why this layout (measured on v5e, tools/exp_selectors.py): the masked
    argmin costs ~5.5 VPU ops/element over the full (T, M) tile for each of
    the k*d rounds; the round-2 (value, col)-pair cache ('foldc') paid ~13
    ops/element in its fold plus heavy per-round cache logic plus a
    host-side nonzero/compaction repair — a net 0.75-0.83x LOSS vs argmin.
    Values-only folding is a pure min/max insertion cascade:

      fold      2*C+1 ops/element, one pass       (C=3 -> 7 vs foldc's 13)
      rounds    ~12 ops on (T, 128) only          (pop cache heads)
      selected  1 eq-compare pass over (T, M); the resulting one-hot IS
                the MXU gather operand, and ONE tiny matmul against a
                static (M, 8) coefficient table [1, col%128, (col//128)%128,
                col//16384] yields the hit count and the column (exact:
                0/1 mask x <=127 integer coefficients, fp32 accumulation)

    Exactness (round-4 design — the round-3 version sent any bitwise tie
    through a whole-tile argmin rerun, so a single tied row cost ~2x and a
    degenerate all-ties input — e.g. a constant image — doubled every
    tile; VERDICT r3 weak #1):

    * ties (eq-compare hit count != 1 at the popped value, including a
      tie with a hidden same-value candidate an exhausted lane no longer
      caches) are resolved IN-ROUND under ``pl.when``: the exact
      first-occurrence pick is the lowest not-yet-consumed column with
      dist == gv (= lax.top_k / torch.topk tie order), re-gathered with
      its own one-hot, and its column is consumed by masking it in the
      retained distance matrix so later rounds cannot re-pick it. Cost is
      ~1 extra eq pass + 1 gather matmul per *tie round* — proportional
      to the number of ties, not all-or-nothing per tile. Rounds skipped
      by dilation run a cheap chunked hit-count so tie consumption stays
      in lockstep with the pop order.
    * only a STRICTLY smaller hidden candidate (an exhausted lane whose
      (C+1)-th-value bound < the popped value — the pop sequence itself
      may be wrong from that round on) flags the row for the whole-tile
      masked-argmin epilogue. P(row) ~ C(kd, C+1)/128^C (see
      _cache_depth); a tied bound (bmin == gv) is NOT flagged — the
      in-round eq-compare sees every column of the full distance matrix,
      cached or not. The epilogue recomputes the distance matrix first
      (tie rounds consume columns in dist_ref) and rebuilds flagged rows
      from round 0.

    Scratch: dist (T, Mp) fp32 (Mp = M rounded to 128, retained for the eq
    compares); mrt (T, D) fp32 and flg (T, 128) int32 carry the main-loop
    results into the predicated epilogue. The fold/pop state itself lives
    in SSA values (statically unrolled loops) so Mosaic can register-
    allocate it instead of bouncing through VMEM every round.
    """
    if groups == 1:
        x_in = x_ref[0]
        y_gd = y_ref[0]         # (Mp, D+8): target features ++ coef table
    else:
        dx = x_ref.shape[2] // groups
        dy = y_ref.shape[2] // groups          # = dx + 8 (coef interleaved)
        x_in = x_ref[0][:, gi * dx:(gi + 1) * dx]
        y_gd = y_ref[0][:, gi * dy:(gi + 1) * dy]
    x_raw = x_in.astype(jnp.float32)
    t, d = x_raw.shape
    m_pad = y_gd.shape[0]
    kd = k * dilation
    big = jnp.float32(jnp.inf)
    bigc = jnp.int32(1 << 30)

    # The caller concatenates an 8-column coefficient table
    # [1, col%128, (col//128)%128, col//16384, 0...] onto the target
    # features IN XLA: each selected round then needs ONE
    # (T, M) @ (M, D+8) matmul for gather + hit-count + column recovery.
    # (A standalone (M, 8) matmul has an 8-lane output — <=6% MXU
    # utilization, measurably dominant in the label kernels — and an
    # in-kernel lane concat costs a ~6us/tile Mosaic relayout.)
    y_in = y_gd[:, :d]
    col_m = jax.lax.broadcasted_iota(jnp.int32, (t, m_pad), 1)

    def compute_dist():
        """(Re)compute the biased distance matrix into dist_ref. Called
        once up front and again by the strict-stale epilogue (tie rounds
        consume columns of dist_ref in place)."""
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
        dist = x_sq - 2.0 * inner + y_sq.T                    # (T, Mp)
        if has_bias:
            dist = dist + (bias_ref[0] if batched_bias else bias_ref[...])
        dist_ref[...] = jnp.where(col_m < m_valid, dist, big)

    compute_dist()

    r_tiles = m_pad // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    gdtype = jnp.bfloat16 if bf16_inputs else jnp.float32

    # ---- values-only fold: min/max insertion cascade --------------------
    # static column slices (a dynamic lane-dim slice costs a relayout copy
    # per step in Mosaic — measured as the difference between this fold
    # and a pl.ds fori_loop version)
    mv = [jnp.full((t, 128), big) for _ in range(cache_c)]
    bnd = jnp.full((t, 128), big)
    for r in range(r_tiles):
        cv = dist_ref[:, r * 128:(r + 1) * 128]
        for s in range(cache_c):
            nv = jnp.minimum(mv[s], cv)
            cv = jnp.maximum(mv[s], cv)
            mv[s] = nv
        bnd = jnp.minimum(bnd, cv)
    for s in range(cache_c):
        mv_ref[:, s * 128:(s + 1) * 128] = mv[s]
    bnd_ref[...] = bnd
    hd_ref[...] = mv[0]
    used_ref[...] = jnp.zeros((t, 128), jnp.int32)
    flg_ref[...] = jnp.zeros((t, 128), jnp.int32)
    mrt_ref[...] = jnp.full((t, d), -jnp.inf, jnp.float32)
    pend_ref[...] = jnp.full((t, d), -jnp.inf, jnp.float32)
    k0, d0 = gi * k, gi * d
    idx_ref[0, :, k0:k0 + k] = jnp.zeros((t, k), jnp.int32)

    # ---- k*d pop rounds on the lane-cache heads (fori_loop + scratch ----
    # refs: a static unroll makes Mosaic keep one live SSA copy of each
    # round's (T, M) eq-mask — the exact VMEM-pressure failure the round-2
    # argmin history documents; measured 18.2 -> 25.1 ms at stage-1 when
    # these rounds were unrolled).
    # The eq-compare + gather matmuls run full-width for moderate M; for
    # large M (label kernels, up to 36864) they stream in the fewest
    # equal 128-aligned chunks <= 4096 wide, bounding the live (T, chunk)
    # transients (many small chunks multiply matmul-issue overhead —
    # measured on the T=80 label kernels).
    n_chunks = 1
    while (m_pad // n_chunks > 4096 or m_pad % n_chunks
           or (m_pad // n_chunks) % 128):
        n_chunks += 1
    g_chunk = m_pad // n_chunks

    def exact_pick(gv):
        """Lowest not-yet-consumed column with dist == gv — the lax.top_k
        / torch.topk first-occurrence tie order. Chunked like the gather
        to bound (T, chunk) transients at large M."""
        idx_j = jnp.full((t,), bigc, jnp.int32)
        for ci in range(n_chunks):
            lo = ci * g_chunk
            eqc = dist_ref[:, lo:lo + g_chunk] == gv[:, None]
            colc = lo + jax.lax.broadcasted_iota(
                jnp.int32, (t, g_chunk), 1)
            idx_j = jnp.minimum(
                idx_j, jnp.min(jnp.where(eqc, colc, bigc), axis=1))
        return idx_j

    def consume(idx_j):
        # mask the picked column so later rounds cannot re-pick it (the
        # cache pop stream stays valid: pops are by value, and the
        # consumed entry's value equals the popped one)
        for ci in range(n_chunks):
            lo = ci * g_chunk
            colc = lo + jax.lax.broadcasted_iota(
                jnp.int32, (t, g_chunk), 1)
            dc = dist_ref[:, lo:lo + g_chunk]
            dist_ref[:, lo:lo + g_chunk] = jnp.where(
                colc == idx_j[:, None], big, dc)

    def gather_update(j, gv):
        sel = j // dilation if dilation > 1 else j
        gp = jnp.zeros((t, d + 8), jnp.float32)
        for ci in range(n_chunks):
            lo, hi = ci * g_chunk, (ci + 1) * g_chunk
            mask = (dist_ref[:, lo:hi] == gv[:, None]).astype(gdtype)
            gp = gp + jax.lax.dot_general(                    # (T, D+8) MXU
                mask, y_gd[lo:hi],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision)
        gathered, p = gp[:, :d], gp[:, d:]
        hits = p[:, 0]
        gc = (p[:, 1] + 128.0 * p[:, 2]
              + 16384.0 * p[:, 3]).astype(jnp.int32)
        # Apply the PREVIOUS selected round's STAGED contribution, then
        # stage this round's. The one-round lag makes the max update
        # tie-repairable: a detected tie only replaces the small (T, D)
        # pending buffer, so no large tensor is live across the
        # predicated region (a conditional mrt max was measured +14-32%
        # on the tie-free common path — Mosaic materializes values that
        # cross pl.when boundaries).
        mrt_ref[...] = jnp.maximum(mrt_ref[...], pend_ref[...])
        pend_ref[...] = gathered - x_raw
        idx_ref[0, :, k0:k0 + k] = jnp.where(
            lane_k == sel, gc[:, None], idx_ref[0, :, k0:k0 + k])

        @pl.when(jnp.max((hits != 1.0).astype(jnp.int32)) > 0)
        def _():
            # in-round exact tie resolution (cost ~= one argmin round,
            # paid per TIE ROUND — not a whole-tile rerun): first-
            # occurrence pick, one-hot re-gather (tied columns may hold
            # different features even at equal distance), consume
            idx_j = exact_pick(gv)
            idx_ref[0, :, k0:k0 + k] = jnp.where(
                lane_k == sel, idx_j[:, None], idx_ref[0, :, k0:k0 + k])
            gp2 = jnp.zeros((t, d + 8), jnp.float32)
            for ci in range(n_chunks):
                lo, hi = ci * g_chunk, (ci + 1) * g_chunk
                colc = lo + jax.lax.broadcasted_iota(
                    jnp.int32, (t, g_chunk), 1)
                m1 = (colc == idx_j[:, None]).astype(gdtype)
                gp2 = gp2 + jax.lax.dot_general(
                    m1, y_gd[lo:hi],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=gather_precision)
            pend_ref[...] = gp2[:, :d] - x_raw
            consume(idx_j)

    def tie_sync(gv):
        """Dilation-skipped rounds pop the cache but run no gather; a tie
        at the popped value must still be consumed in column order or a
        later round re-picks it. Chunked hit count, exact pick only when
        a tie actually occurred (M is small on every dilated stage, so
        the extra pass is negligible)."""
        hits = jnp.zeros((t,), jnp.float32)
        for ci in range(n_chunks):
            lo = ci * g_chunk
            eqc = dist_ref[:, lo:lo + g_chunk] == gv[:, None]
            hits = hits + jnp.sum(eqc.astype(jnp.float32), axis=1)

        @pl.when(jnp.max((hits != 1.0).astype(jnp.int32)) > 0)
        def _():
            consume(exact_pick(gv))

    def round_body(j, _):
        hd = hd_ref[...]
        used = used_ref[...]
        gv = jnp.min(hd, axis=1)                              # (T,)
        lmask = hd == gv[:, None]                             # (T, 128)
        li = jnp.min(jnp.where(lmask, lane128, bigc), axis=1)
        win = lmask & (lane128 == li[:, None])
        # hidden-candidate check BEFORE consuming: an exhausted lane whose
        # (C+1)-th-value bound could STRICTLY beat the winner means the
        # pop sequence itself may be wrong from this round on -> epilogue.
        # A tied bound (bmin == gv) needs no flag: the in-round eq-compare
        # runs against the full distance matrix and sees the hidden
        # same-value candidate.
        bmin = jnp.min(jnp.where(used >= cache_c, bnd_ref[...], big),
                       axis=1)
        stale = (bmin < gv) & jnp.isfinite(bmin)
        flg_ref[...] = flg_ref[...] | stale[:, None].astype(jnp.int32)
        used2 = used + win.astype(jnp.int32)
        used_ref[...] = used2
        nxt = jnp.full((t, 128), big)
        for s in reversed(range(1, cache_c)):
            nxt = jnp.where(used2 == s, mv_ref[:, s * 128:(s + 1) * 128],
                            nxt)
        hd_ref[...] = jnp.where(win, nxt, hd)

        if dilation > 1:
            @pl.when(j % dilation == 0)
            def _():
                gather_update(j, gv)

            @pl.when(j % dilation != 0)
            def _():
                tie_sync(gv)
        else:
            gather_update(j, gv)
        return 0

    jax.lax.fori_loop(0, kd, round_body, 0)
    # flush the last selected round's staged contribution
    mrt_ref[...] = jnp.maximum(mrt_ref[...], pend_ref[...])
    mr_ref[0, :, d0:d0 + d] = mrt_ref[...].astype(mr_ref.dtype)

    # ---- exact epilogue for tiles containing a strict-stale row ---------
    # (P ~ 1e-5 per tile on non-adversarial data; tie rounds consumed
    # columns of dist_ref in place, so recompute it before re-selecting)
    @pl.when(jnp.max(flg_ref[...]) > 0)
    def _():
        compute_dist()
        rf = flg_ref[:, :1] > 0                               # (T, 1)
        mrt_ref[...] = jnp.where(rf, jnp.full((t, d), -jnp.inf,
                                              jnp.float32), mrt_ref[...])

        def egather(jj, idx_j, mask):
            sel = jj // dilation if dilation > 1 else jj
            idx_ref[0, :, k0:k0 + k] = jnp.where(
                (lane_k == sel) & rf, idx_j[:, None],
                idx_ref[0, :, k0:k0 + k])
            gathered = jax.lax.dot_general(
                mask.astype(gdtype), y_gd,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=gather_precision)[:, :d]
            mrt_ref[...] = jnp.where(
                rf, jnp.maximum(mrt_ref[...], gathered - x_raw),
                mrt_ref[...])

        def eround(jj, _):
            # min + lexicographic column extraction = lax.top_k /
            # torch.topk first-occurrence tie order
            dd = dist_ref[...]
            gv = jnp.min(dd, axis=1)
            eq = dd == gv[:, None]
            idx_j = jnp.min(jnp.where(eq, col_m, bigc),
                            axis=1).astype(jnp.int32)
            mask = col_m == idx_j[:, None]
            if dilation > 1:
                @pl.when(jj % dilation == 0)
                def _():
                    egather(jj, idx_j, mask)
            else:
                egather(jj, idx_j, mask)

            @pl.when(jj != kd - 1)
            def _():
                dist_ref[...] = jnp.where(mask, big, dd)

            return 0

        jax.lax.fori_loop(0, kd, eround, 0)
        mr_ref[0, :, d0:d0 + d] = mrt_ref[...].astype(mr_ref.dtype)


# selection algorithm for the fused kernel:
#   'auto'   — foldv when the target axis is large enough to amortize the
#              fold (M >= 1024), argmin otherwise
#   'argmin' — masked min + lex column extraction over the full (T, M)
#              tile every round
#   'foldv'  — values-only per-lane-class cache + eq-compare column
#              recovery + exact in-kernel epilogue for flagged tiles
_MR_SELECTOR = "auto"


def set_mr_selector(name: str):
    global _MR_SELECTOR
    assert name in ("auto", "argmin", "foldv"), name
    _MR_SELECTOR = name


def _use_foldv(m: int) -> bool:
    if _MR_SELECTOR == "auto":
        return m >= 1024
    return _MR_SELECTOR == "foldv"


def _run_pallas(x, y, bias, k, dilation, tile_n, interpret, selector,
                debug_flags=False, groups: int = 1):
    """One pallas_call of the fused kernel. ``bias`` may be (N, M) shared
    or (BG, N, M) batched. Returns (idx, mr) — or (idx, mr, flags) with
    ``debug_flags`` on the foldv selector, where flags (BG, N_pad, 128)
    is nonzero for rows sent through the strict-stale epilogue (the
    perf-contract tests assert it stays zero on tie-heavy inputs).

    ``groups > 1`` is the FOLD-AWARE path: x (B, N, g*D) / y (B, M, g*D)
    arrive UNFOLDED and each grid step's BlockSpec slices group gi's
    channels [gi*D, (gi+1)*D) directly — the (B, N, C) <-> (B*g, N, C/g)
    fold/unfold transposes that cost ~0.16-0.49 ms per materialized copy
    at stage-1 geometry (r5 device trace) never exist. The kernel body is
    untouched: block shapes are identical to the folded call, so results
    are bitwise those of fold_groups -> kernel -> unfold_groups. mr comes
    back (B, N, g*D) unfolded; idx comes back (B, N, g*k) channel-grouped
    (reshape to (B, N, g, k); transpose to the folded (B*g, N, k) layout
    only if a consumer needs it)."""
    if groups > 1:
        b_true, n, c_full = x.shape
        d = c_full // groups
        bg = b_true * groups
        assert y.shape[2] == c_full and x.shape[0] == y.shape[0]
        assert bias is None or bias.ndim == 2, \
            "batched bias not supported on the fold-aware path"
    else:
        bg, n, d = x.shape
    m = y.shape[1]
    tile_n = _pick_tile(n, tile_n)
    n_pad = _round_up(n, tile_n)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x

    foldv = selector == "foldv"
    # the lane-class fold tiles the target axis in 128-lane classes: pad
    # targets/bias to a 128 multiple, mask with m_valid inside
    m_blk = _round_up(m, 128) if foldv else m
    if m_blk != m:
        y = jnp.pad(y, ((0, 0), (0, m_blk - m), (0, 0)))

    # Grid order depends on which input is the big per-step fetch
    # (ADVICE r3): WITH a shared bias, (query-tile, bg) keeps the (T, M)
    # fp32 bias block (1.3 MB at stage-1, the largest input) resident
    # across the inner bg steps; WITHOUT one, (bg, query-tile) keeps the
    # (M, D) target block resident across the inner tile steps instead
    # (the multi-tile no-bias paths — edge-partition local kNN, the
    # grapher y-target call — otherwise re-fetch y n_tiles times).
    has_bias = bias is not None
    batched_bias = has_bias and bias.ndim == 3
    # groups > 1 (fold-aware): blocks carry ALL groups' channels (their
    # last dim equals the full array dim — the only non-128-divisible
    # layout Mosaic accepts) and the kernel runs a static per-group loop,
    # so the grid batches over the TRUE batch dim.
    n_batch = x.shape[0] if groups > 1 else bg
    if has_bias and not batched_bias:
        grid = (n_pad // tile_n, n_batch)

        def _tile_bg(i, b):
            return i, b
    else:
        grid = (n_batch, n_pad // tile_n)

        def _tile_bg(b, i):
            return i, b

    def node_map(*g):
        i, b = _tile_bg(*g)
        return b, i, 0

    def target_map(*g):
        _, b = _tile_bg(*g)
        return b, 0, 0

    if has_bias:
        bias2 = bias.astype(jnp.float32)
        pad_n = n_pad - (bias2.shape[-2])
        if pad_n or m_blk != m:
            widths = ((0, pad_n), (0, m_blk - m))
            if batched_bias:
                widths = ((0, 0),) + widths
            bias2 = jnp.pad(bias2, widths)
        if batched_bias:
            bias_spec = pl.BlockSpec((1, tile_n, m_blk), node_map,
                                     memory_space=pltpu.VMEM)
        else:
            bias_spec = pl.BlockSpec(
                (tile_n, m_blk), lambda *g: (_tile_bg(*g)[0], 0),
                memory_space=pltpu.VMEM)
    else:
        bias2 = jnp.zeros((8, 128), jnp.float32)
        bias_spec = pl.BlockSpec((8, 128), lambda *g: (0, 0),
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
    kd = k * dilation
    d_in = d
    if foldv:
        # append the 8-column coefficient table
        # [1, col%128, (col//128)%128, col//16384, 0x4] to the targets in
        # XLA (cheap fusion): the kernel's gather matmul then returns the
        # hit count + column parts for free in lanes [D, D+8) — an
        # in-kernel lane concat costs a measured ~6us/tile relayout and a
        # standalone (M, 8) matmul wastes the MXU (8-lane output)
        gdt = jnp.bfloat16 if bf16_inputs else jnp.float32
        col = jnp.arange(m_blk, dtype=jnp.int32)
        coef = jnp.stack(
            [jnp.ones_like(col), col % 128, (col // 128) % 128,
             col // 16384] + [jnp.zeros_like(col)] * 4, axis=1)
        if groups > 1:
            # interleave the coef table after EACH group's channels so a
            # contiguous (1, M, D+8) channel block serves every group
            # (y is the small pooled target set — this copy is tiny)
            b_t = y.shape[0]
            yg = y.astype(gdt).reshape(b_t, m_blk, groups, d)
            cf = jnp.broadcast_to(coef.astype(gdt)[None, :, None, :],
                                  (b_t, m_blk, groups, 8))
            y = jnp.concatenate([yg, cf], axis=3).reshape(
                b_t, m_blk, groups * (d + 8))
        else:
            y = jnp.concatenate(
                [y.astype(gdt),
                 jnp.broadcast_to(coef.astype(gdt)[None], (bg, m_blk, 8))],
                axis=2)
        d_in = d + 8
    if foldv:
        model = _scoped_vmem_bytes_foldv(tile_n, m_blk, _cache_depth(kd),
                                         d, itembytes)
    else:
        model = _scoped_vmem_bytes(tile_n, m_blk, k, dilation, d, itembytes)
    # the limit is intentionally generous vs the model (x1.6 + 8M): a
    # marginal misestimate must not fail the compile — the model's job is
    # the fused/fallback DECISION (fused_fits), the limit's job is only to
    # bound the compiler (measured: T=80, M=20736 foldv actually allocates
    # 59.5M where the 5.5-copy model said 44M)
    vmem_limit = min(_VMEM_CAP,
                     max(24 * 1024 * 1024,
                         int(model * 1.6) + 8 * 1024 * 1024))

    out_specs = [
        pl.BlockSpec((1, tile_n, groups * k), node_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, groups * d), node_map,
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_batch, n_pad, groups * k), jnp.int32),
        jax.ShapeDtypeStruct((n_batch, n_pad, groups * d), x.dtype),
    ]
    if foldv:
        c = _cache_depth(kd)
        kern = functools.partial(_kernel_foldv, cache_c=c,
                                 batched_bias=batched_bias)
        scratch = [pltpu.VMEM((tile_n, m_blk), jnp.float32),
                   pltpu.VMEM((tile_n, d), jnp.float32),
                   pltpu.VMEM((tile_n, c * 128), jnp.float32),
                   pltpu.VMEM((tile_n, 128), jnp.float32),
                   pltpu.VMEM((tile_n, 128), jnp.float32),
                   pltpu.VMEM((tile_n, 128), jnp.int32),
                   pltpu.VMEM((tile_n, 128), jnp.int32),
                   pltpu.VMEM((tile_n, d), jnp.float32)]  # pend (staged)
        if debug_flags:
            assert groups == 1, "debug_flags requires the folded call"
            inner_kern = kern

            def kern(x_ref, y_ref, bias_ref, idx_ref, mr_ref, flg_out,
                     *scr, **kw):
                inner_kern(x_ref, y_ref, bias_ref, idx_ref, mr_ref,
                           *scr, **kw)
                flg_out[0] = scr[6][...]  # flg_ref scratch

            out_specs = out_specs + [pl.BlockSpec(
                (1, tile_n, 128), node_map, memory_space=pltpu.VMEM)]
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((bg, n_pad, 128), jnp.int32)]
    else:
        assert not debug_flags, "debug_flags requires the foldv selector"
        kern = functools.partial(_kernel, batched_bias=batched_bias)
        scratch = [pltpu.VMEM((tile_n, m), jnp.float32),
                   pltpu.VMEM((tile_n, d), jnp.float32)]
    outs = pl.pallas_call(
        functools.partial(kern, k=k, dilation=dilation, m_valid=m,
                          has_bias=has_bias,
                          gather_precision=gather_precision,
                          bf16_inputs=bf16_inputs, groups=groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, groups * d), node_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_blk, groups * d_in), target_map,
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
    if debug_flags:
        return idx, mr, outs[2]
    return idx, mr


def _fused_forward(x, y, bias, k, dilation, tile_n, interpret):
    # off-TPU (tests, explicit set_knn_impl('pallas') on CPU) fall back to
    # the interpreter so the fused path stays functional everywhere
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    m = y.shape[1]
    selector = "foldv" if _use_foldv(m) else "argmin"
    return _run_pallas(x, y, bias, k, dilation, tile_n, interpret, selector)


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


def _bwd_kernel(x_ref, y_ref, idx_ref, g_ref, gx_ref, gy_ref, rel_ref, *,
                k: int):
    """Scatter-free backward of gather + max-relative: the per-neighbor
    one-hot masks (recomputed from the saved indices) turn the y-gradient
    scatter-add into MXU matmuls ``onehot_j^T @ (g * ind_j / count)`` —
    the XLA transpose of `take_along_axis` is a serialized scatter that
    measured ~3.5x the entire fused forward at stage-1 geometry.

    Max-tie semantics replicate lax.reduce_max's JVP (jax lax.py
    `_reduce_chooser_jvp_rule`): the gradient splits equally among tied
    maxima; the relative differences and the max are computed in the
    INPUT dtype so the indicator set is bitwise the one the XLA
    recompute-gather path (`_mr_from_idx`) produces.

    Grid (bg, tiles): tiles innermost so the (M, D) gy block index is
    unchanged across consecutive steps and accumulates in VMEM
    (zero-initialized at the first tile).
    """
    i = pl.program_id(1)
    x_in = x_ref[0]                                           # (T, D)
    y_in = y_ref[0]                                           # (Mp, D)
    g_in = g_ref[0]                                           # (T, D)
    t, d = x_in.shape
    m_pad = y_in.shape[0]
    in_dtype = x_in.dtype
    bf16 = in_dtype == jnp.bfloat16
    precision = (jax.lax.Precision.DEFAULT if bf16
                 else jax.lax.Precision.HIGHEST)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (t, m_pad), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    idx_all = idx_ref[0]                                      # (T, k)

    @pl.when(i == 0)
    def _():
        gy_ref[0] = jnp.zeros((m_pad, d), gy_ref.dtype)

    def idx_col(j):
        # Mosaic has no dynamic_slice lowering for values: extract the
        # j-th index column with a masked lane reduce instead
        return jnp.sum(jnp.where(lane_k == j, idx_all, 0),
                       axis=1)[:, None]                       # (T, 1)

    # pass 1 (fori_loop: one live (T, M) mask — a static unroll makes
    # Mosaic keep k of them live): relative neighbor features in the
    # INPUT dtype, staged into the rel scratch along sublanes
    def pass1(j, _):
        mask = (col_m == idx_col(j)).astype(in_dtype)
        xj = jax.lax.dot_general(
            mask, y_in, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(in_dtype)
        rel_ref[pl.ds(j * t, t), :] = xj - x_in
        return 0

    jax.lax.fori_loop(0, k, pass1, 0)

    # small (T, D) reductions: static slices of the rel scratch. The tie
    # indicator compares in fp32 (bf16 -> fp32 is an exact embedding, so
    # equality is unchanged; v5e Mosaic has no bf16 compare).
    mr = rel_ref[0:t, :]
    for j in range(1, k):
        mr = jnp.maximum(mr, rel_ref[j * t:(j + 1) * t, :])
    mr32 = mr.astype(jnp.float32)
    cnt = jnp.zeros((t, d), jnp.float32)
    for j in range(k):
        cnt = cnt + (rel_ref[j * t:(j + 1) * t, :].astype(jnp.float32)
                     == mr32).astype(jnp.float32)
    gsc = g_in.astype(jnp.float32) / cnt

    # pass 2: per-neighbor gradient, scattered via TRANSPOSED matmul
    def pass2(j, _):
        rel_j = rel_ref[pl.ds(j * t, t), :].astype(jnp.float32)
        gj = jnp.where(rel_j == mr32, gsc, 0.0).astype(in_dtype)
        mask = (col_m == idx_col(j)).astype(in_dtype)
        gy_ref[0] = gy_ref[0] + jax.lax.dot_general(          # (Mp, D) MXU
            mask, gj, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(gy_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k, pass2, 0)
    # d/dx of max_j(x_j - x) = -(sum_j ind_j / count) * g = -g exactly
    gx_ref[0] = (-g_in.astype(jnp.float32)).astype(gx_ref.dtype)


def _bwd_kernel_batched(x_ref, y_ref, idx_ref, g_ref, gx_ref, gy_ref,
                        rel_ref, msk_ref, *, k: int):
    """Batched-mask variant of ``_bwd_kernel`` (round 4): the k one-hot
    masks are built ONCE into a (k*T, M) scratch and both passes run as a
    SINGLE big MXU matmul each — (kT, M) @ (M, D) gather and
    (kT, M)^T-contracted (kT, D) scatter — instead of 2k small issues
    with recomputed masks. Same math/tie semantics as _bwd_kernel;
    selected when the mask stack fits scoped VMEM (stage kernels; the
    large-M label kernels keep the looped variant)."""
    i = pl.program_id(1)
    x_in = x_ref[0]                                           # (T, D)
    y_in = y_ref[0]                                           # (Mp, D)
    g_in = g_ref[0]                                           # (T, D)
    t, d = x_in.shape
    m_pad = y_in.shape[0]
    in_dtype = x_in.dtype
    bf16 = in_dtype == jnp.bfloat16
    precision = (jax.lax.Precision.DEFAULT if bf16
                 else jax.lax.Precision.HIGHEST)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (t, m_pad), 1)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
    idx_all = idx_ref[0]                                      # (T, k)

    @pl.when(i == 0)
    def _():
        gy_ref[0] = jnp.zeros((m_pad, d), gy_ref.dtype)

    def build(j, _):
        idx_j = jnp.sum(jnp.where(lane_k == j, idx_all, 0),
                        axis=1)[:, None]                      # (T, 1)
        msk_ref[pl.ds(j * t, t), :] = (col_m == idx_j).astype(in_dtype)
        return 0

    jax.lax.fori_loop(0, k, build, 0)

    # pass 1: all k gathers in ONE matmul
    xj_all = jax.lax.dot_general(                             # (kT, D)
        msk_ref[...], y_in, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).astype(in_dtype)
    for j in range(k):
        rel_ref[j * t:(j + 1) * t, :] = xj_all[j * t:(j + 1) * t, :] - x_in

    mr = rel_ref[0:t, :]
    for j in range(1, k):
        mr = jnp.maximum(mr, rel_ref[j * t:(j + 1) * t, :])
    mr32 = mr.astype(jnp.float32)
    cnt = jnp.zeros((t, d), jnp.float32)
    for j in range(k):
        cnt = cnt + (rel_ref[j * t:(j + 1) * t, :].astype(jnp.float32)
                     == mr32).astype(jnp.float32)
    gsc = g_in.astype(jnp.float32) / cnt

    # pass 2: per-neighbor gradients staged over the rel slots, then ONE
    # transposed matmul scatters them all
    for j in range(k):
        rel_j = rel_ref[j * t:(j + 1) * t, :].astype(jnp.float32)
        rel_ref[j * t:(j + 1) * t, :] = jnp.where(
            rel_j == mr32, gsc, 0.0).astype(in_dtype)
    gy_ref[0] = gy_ref[0] + jax.lax.dot_general(              # (Mp, D) MXU
        msk_ref[...], rel_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision).astype(gy_ref.dtype)
    gx_ref[0] = (-g_in.astype(jnp.float32)).astype(gx_ref.dtype)


def _bwd_vmem_bytes(tile_t: int, m_pad: int, k: int, d: int,
                    itembytes: int) -> int:
    return (4 * tile_t * m_pad * itembytes            # mask transients
            + (k + 6) * tile_t * d * 4                # rel stack + temps
            + 3 * m_pad * d * 4                       # gy block + acc
            + 2 * m_pad * d * itembytes)              # y (double-buffered)


def _bwd_pallas(x, y, idx, g_mr, k, tile_n, interpret):
    bg, n, d = x.shape
    m = y.shape[1]
    tile_n = _pick_tile(n, tile_n)
    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, n_pad - n), (0, 0)))
        g_mr = jnp.pad(g_mr, ((0, 0), (0, n_pad - n), (0, 0)))
    itembytes = jnp.dtype(x.dtype).itemsize
    msk_bytes = k * tile_n * m * itembytes
    batched = (2 * (_bwd_vmem_bytes(tile_n, m, k, d, itembytes)
                    + msk_bytes) <= _VMEM_CAP)
    kern = _bwd_kernel_batched if batched else _bwd_kernel
    scratch = [pltpu.VMEM((k * tile_n, d), x.dtype)]
    if batched:
        scratch.append(pltpu.VMEM((k * tile_n, m), x.dtype))
    gx, gy = pl.pallas_call(
        functools.partial(kern, k=k),
        grid=(bg, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((bg, m, d), y.dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bg * n_pad * m * d * k,
            bytes_accessed=bg * (3 * n_pad * d + 2 * m * d) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=min(
            _VMEM_CAP,
            max(24 * 1024 * 1024,
                2 * (_bwd_vmem_bytes(tile_n, m, k, d, itembytes)
                     + (msk_bytes if batched else 0))))),
    )(x, y, idx, g_mr)
    if n_pad != n:
        gx = gx[:, :n]
    return gx, gy


def _fwd(x, y, bias, k, dilation, tile_n, interpret):
    idx, mr = _fused_forward(x, y, bias, k, dilation, tile_n, interpret)
    return (idx, mr), (x, y, idx)


def _bwd(k, dilation, tile_n, interpret, res, g):
    x, y, idx = res
    _, g_mr = g  # idx output is integer: no gradient
    # the graph build is non-differentiable on the live path
    # (stop_gradient semantics, torch_edge.py:17); only the gather +
    # max-relative is differentiated
    interp = interpret or jax.default_backend() not in ("tpu", "axon")
    fits = _bwd_vmem_bytes(
        _pick_tile(x.shape[1], tile_n), y.shape[1], k, x.shape[2],
        jnp.dtype(x.dtype).itemsize) * 2 <= _VMEM_CAP
    if fits:
        gx, gy = _bwd_pallas(x, y, idx, g_mr, k, tile_n, interp)
        return gx, gy, None
    # fallback: recompute the gather path and differentiate it with XLA
    _, vjp = jax.vjp(lambda x_, y_: _mr_from_idx(x_, y_, idx), x, y)
    gx, gy = vjp(g_mr)
    return gx, gy, None


knn_mr_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fold-aware entry: unfolded (B, N, g*D) tensors, BlockSpec channel slicing
# ---------------------------------------------------------------------------

def _fold_g(x: Array, g: int) -> Array:
    """(B, N, g*D) -> (B*g, N, D); group gi = channels [gi*D, (gi+1)*D)."""
    b, n, c = x.shape
    return x.reshape(b, n, g, c // g).transpose(0, 2, 1, 3).reshape(
        b * g, n, c // g)


def _unfold_g(x: Array, g: int) -> Array:
    bg, n, d = x.shape
    return x.reshape(bg // g, g, n, d).transpose(0, 2, 1, 3).reshape(
        bg // g, n, g * d)


def _fused_forward_grouped(x, y, bias, k, dilation, groups, tile_n,
                           interpret):
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    selector = "foldv" if _use_foldv(y.shape[1]) else "argmin"
    idx, mr = _run_pallas(x, y, bias, k, dilation, tile_n, interpret,
                          selector, groups=groups)
    b, n, _ = idx.shape
    return idx.reshape(b, n, groups, k), mr


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def knn_mr_fused_grouped(x: Array, y: Array, bias: Array | None, k: int,
                         dilation: int = 1, groups: int = 2,
                         tile_n: int = 256, interpret: bool = False):
    """Fold-aware fused kNN + max-relative: the multi-group fold
    (torch_vertex.py:199-202) happens in the kernel's BlockSpec channel
    index map instead of materialized (B, N, C) <-> (B*g, N, C/g)
    transposes (r5 device trace: those copies cost ~2.7 ms/eval step at
    stage 1 alone).

    Args:
      x: (B, N, g*D) raw queries, group-major channels (= unfold layout).
      y: (B, M, g*D) raw targets.
      bias: optional (N, M) shared distance bias.
    Returns:
      (idx (B, N, g, k) int32, maxrel (B, N, g*D)) — maxrel is bitwise
      ``unfold_groups(knn_mr_fused(fold_groups(x), fold_groups(y)))``.
    """
    return _fused_forward_grouped(x, y, bias, k, dilation, groups, tile_n,
                                  interpret)


def _fwd_grouped(x, y, bias, k, dilation, groups, tile_n, interpret):
    idx, mr = _fused_forward_grouped(x, y, bias, k, dilation, groups,
                                     tile_n, interpret)
    return (idx, mr), (x, y, idx)


def _bwd_grouped(k, dilation, groups, tile_n, interpret, res, g):
    """Backward via the folded bwd kernel (the fwd's saved tensors fold
    here; extending the BlockSpec trick into _bwd_pallas is the open
    follow-up)."""
    x, y, idx = res
    _, g_mr = g
    xf = _fold_g(x, groups)
    yf = _fold_g(y, groups)
    gf = _fold_g(g_mr, groups).astype(x.dtype)
    b, n, _, _ = idx.shape
    idxf = idx.transpose(0, 2, 1, 3).reshape(b * groups, n, k)
    interp = interpret or jax.default_backend() not in ("tpu", "axon")
    fits = _bwd_vmem_bytes(
        _pick_tile(n, tile_n), yf.shape[1], k, xf.shape[2],
        jnp.dtype(x.dtype).itemsize) * 2 <= _VMEM_CAP
    if fits:
        gx, gy = _bwd_pallas(xf, yf, idxf, gf, k, tile_n, interp)
    else:
        _, vjp = jax.vjp(lambda x_, y_: _mr_from_idx(x_, y_, idxf), xf, yf)
        gx, gy = vjp(gf)
    return _unfold_g(gx, groups), _unfold_g(gy, groups), None


knn_mr_fused_grouped.defvjp(_fwd_grouped, _bwd_grouped)
