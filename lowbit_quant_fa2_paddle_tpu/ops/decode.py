"""Autoregressive decode attention over quantized KV caches (contiguous and
paged), plus cache maintenance ops.

TPU re-design of the reference's split-KV decode kernel
(src/triton/utils/quant_sglang_triton_attn.py: two-stage decode — stage-1
partial attention per KV split over a paged ``Req_to_tokens`` table with
in-kernel dequant of packed KV, stage-2 softmax-reduce over splits, with
``logit_cap`` tanh capping) and the KIVI quantized-KV-cache streaming
helpers (src/triton/utils/quant/new_pack.py:9-144).

Why there is no literal "stage 2" here: the reference splits KV across GPU
SMs for occupancy and reduces partials afterwards. A TPU core runs the grid
sequentially with double-buffered block DMA, so one kernel streams the whole
cache at full HBM bandwidth — int8 codes halve the bytes streamed, which is
the entire game for decode. The cross-device partial merge
(parallel/ring.py:_merge) covers the multi-chip split case.

Paged gather, TPU-style: the page table is a scalar-prefetch argument and
the BlockSpec index map reads it — ``(hi, table[bi, ji], 0, 0)`` — so the
automatic DMA pipeline performs the page gather; no hand-written pointer
chasing (contrast reference ``Req_to_tokens`` arithmetic, lines 43-243).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops.quant import (
    EPS,
    INT8_QMAX,
    cdiv,
    default_interpret,
)
from lowbit_quant_fa2_paddle_tpu.ops.reference import round_away

LOG2E = math.log2(math.e)
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NEG_INIT = -1e30


def _unpack4_cols(packed: jax.Array) -> jax.Array:
    """Nibble-packed [N, D/2] int8 -> [N, D] f32 (halves-of-D scheme, same
    layout as ops/quant.quant_int4). Shifts run in int32 — Mosaic cannot
    legalize vector shifts on i8."""
    p32 = packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _decode_kernel(
    lengths_ref,
    table_ref,
    q_ref,
    k_ref,
    ks_ref,
    v_ref,
    vs_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    block_kv: int,
    logit_cap: float,
    sm_scale: float,
    v_quantized: bool,
    k_bits: int = 8,
    v_bits: int = 8,
    int_qk: bool = False,
    int_pv: bool = False,
    heads_per_step: int = 1,
    window: int = 0,
    sink: int = 0,
    q_tokens: int = 1,
    group: int = 1,
    compact: bool = False,
    sink_pages: int = 0,
    fast_interior: bool = False,
):
    b = pl.program_id(0)
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    # With heads_per_step > 1 the blocks carry hb KV heads ([1, hb, ...])
    # and one grid step runs the hb head-computations back to back: hb x
    # the DMA bytes per step, so the fixed per-step cost (loop/DMA-issue)
    # amortizes — the loss that kept the int8 stream at ~540 GB/s while
    # bf16 (2x the bytes per step) ran ~750 (r3 block sweep).
    gp = m_scr.shape[0] // heads_per_step  # padded group rows per head

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lengths_ref[b]
    # Multi-token decode (speculative verify): the q block carries
    # q_tokens x group rows — query token t's rows are [t*group, (t+1)*group)
    # and may attend pos < length - (q_tokens - 1 - t). The extra queries
    # ride the SUBLANE dim the single-token path already pads to 8, so
    # verifying a handful of draft tokens streams the cache exactly once at
    # single-token cost. With q_tokens == 1 this reduces to pos < length.
    # Sliding window: attend only the last `window` rows of each query's
    # own limit. Below-window blocks are predicated off below and their
    # DMAs clamped away in the launcher's index maps.
    start = None
    if window > 0:
        start = jnp.maximum(length - (q_tokens - 1) - window, 0)
    if compact:
        # Compacted banded walk: the page grid dim holds ONLY
        # sink_pages + in-window pages (a static count derived from the
        # window), so below-window pages cost zero grid steps — the decode
        # twin of the prefill kernels' table-compacted banded grid. Step j
        # maps to logical page j (sink phase) or window_start_page +
        # (j - sink_pages) (window phase); the two phases partition the
        # visible key set disjointly (sink: pos < sink; window:
        # pos >= max(limit - window, sink)), so a page visited by both
        # phases never double-counts a position.
        is_sink_step = j < sink_pages if sink_pages else False
        ws = jnp.maximum(start, sink) // block_kv
        jr = ws + (j - sink_pages)
        j_act = jnp.where(is_sink_step, j, jr) if sink_pages else jr
    else:
        j_act = j

    def _head_block(t, masked=True):
        rows = slice(t * gp, (t + 1) * gp)
        q = q_ref[0, t]  # [G, D] f32
        ks_row = ks_ref[t, 0]  # [1, BK]
        if int_qk and k_bits in (8, 4):
            # Integer-domain QK: quantize q per-row IN-KERNEL (the q tile is
            # one [G, D] vreg-row — the chain is noise) and feed the int8 K
            # codes STRAIGHT to the MXU (s8s8 -> s32). The f32 path below
            # must first materialize a 4x-sized f32 copy of the whole
            # [BK, D] tile on the VPU; at 128K context that upcast pass is
            # exactly the ~30% of stream rate the int8 path was losing
            # (DECODE_TPU.json r2: 541 GB/s vs bf16's 772).
            qa = jnp.max(jnp.abs(q), axis=-1, keepdims=True) / 127.0 + EPS
            q8 = round_away(q / qa).astype(jnp.int8)
            if k_bits == 4:
                p32 = k_ref[t, 0].astype(jnp.int32)  # [BK, D/2]
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(p32, 28), 28
                ).astype(jnp.int8)
                hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.int8)
                dh = p32.shape[-1]
                sI = jax.lax.dot_general(
                    q8[:, :dh], lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) + jax.lax.dot_general(
                    q8[:, dh:], hi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                sI = jax.lax.dot_general(
                    q8, k_ref[t, 0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [G, BK]
            s = sI.astype(jnp.float32) * (qa * sm_scale)
        elif k_bits == 4:
            # Packed contraction without materializing the unpacked tile:
            # unpacked columns are [lo | hi] (halves-of-D), so
            # q @ unpack(kp)^T == q_lo @ lo^T + q_hi @ hi^T — two half-width
            # dots instead of shifts + a lane-concat relayout on the big
            # [BK, D] tile (the concat was costing more than the halved DMA
            # saved; see DECODE_TPU.json history).
            p32 = k_ref[t, 0].astype(jnp.int32)  # [BK, D/2]
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(p32, 28), 28
            ).astype(jnp.float32)
            hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.float32)
            dh = p32.shape[-1]
            s = jax.lax.dot_general(
                q[:, :dh], lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q[:, dh:], hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, BK]
            s = s * sm_scale
        else:
            k = k_ref[t, 0].astype(jnp.float32)  # [BK, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [G, BK]
            s = s * sm_scale
        s = s * ks_row
        if logit_cap > 0:
            # tanh capping in natural space (reference quant_sglang logit_cap)
            s = logit_cap * jnp.tanh(s / logit_cap)
        s = s * LOG2E
        if masked:
            pos = j_act * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if q_tokens > 1:
                # Per-row causal limit: row r belongs to query token r // group.
                row_t = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0) // group
                limit = length - (q_tokens - 1) + row_t  # [G, 1]
            else:
                limit = length
            valid = pos < limit
            if compact:
                # Disjoint phase partition of the visible set (see j_act above).
                # NB: composed with and/or, never jnp.where — Mosaic cannot
                # legalize arith.select on i1 VECTORS (compiles only in
                # interpret mode).
                win_ok = pos >= limit - window
                if sink > 0:
                    win_ok = jnp.logical_and(win_ok, pos >= sink)
                    phase = jnp.logical_or(
                        jnp.logical_and(is_sink_step, pos < sink),
                        jnp.logical_and(jnp.logical_not(is_sink_step), win_ok),
                    )
                else:
                    phase = win_ok
                valid = jnp.logical_and(valid, phase)
            elif window is not None and window > 0:
                inw = pos >= limit - window
                if sink > 0:
                    # StreamingLLM anchors: keys [0, sink) stay visible.
                    inw = jnp.logical_or(inw, pos < sink)
                valid = jnp.logical_and(valid, inw)
            s = jnp.where(valid, s, MASK_VALUE)

        m_prev = m_scr[rows]
        l_prev = l_scr[rows]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[rows] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_scr[rows] = m_next

        if v_quantized:
            # In-kernel per-token V dequant: fold the scale row into P's
            # columns (commutes through the PV contraction) — one [G,BK]
            # multiply instead of a [BK,D] one.
            p = p * vs_ref[t, 0]
        if int_pv and v_quantized and v_bits == 8:
            # Integer-domain PV: requantize the (v_scale-folded) P row to
            # int8 per q-row and contract codes-on-codes (s8s8 -> s32) —
            # the V tile feeds the MXU as stored, deleting its f32 upcast
            # pass. P >= 0 so round-to-nearest is the +0.5 trick; the
            # per-row scale pa restores magnitude after the dot. The extra
            # quant chain touches only the [G, BK] row.
            pa = jnp.max(p, axis=-1, keepdims=True) / 127.0 + EPS
            p8 = (p / pa + 0.5).astype(jnp.int8)
            pvI = jax.lax.dot_general(
                p8, v_ref[t, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            pv = pvI.astype(jnp.float32) * pa
        elif v_bits == 4:
            # Same no-concat trick on the PV side: the output halves
            # [pv_lo | pv_hi] come from two half-width dots; the only concat
            # left is on the tiny [G, D] result.
            p32 = v_ref[t, 0].astype(jnp.int32)  # [BK, D/2]
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(p32, 28), 28
            ).astype(jnp.float32)
            hi = jax.lax.shift_right_arithmetic(p32, 4).astype(jnp.float32)
            pv = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        p, lo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                    jax.lax.dot_general(
                        p, hi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                ],
                axis=-1,
            )
        else:
            v = v_ref[t, 0].astype(jnp.float32)  # [BK, D]
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        acc_scr[rows] = acc_scr[rows] * alpha[:, :1] + pv


    live = j_act * block_kv < length
    if compact:
        if sink_pages:
            live = jnp.logical_and(
                live,
                jnp.logical_or(
                    jnp.logical_not(is_sink_step), j * block_kv < sink
                ),
            )
    elif start is not None:
        in_band = j * block_kv + block_kv > start
        if sink > 0:
            in_band = jnp.logical_or(in_band, j * block_kv < sink)
        live = jnp.logical_and(live, in_band)

    # Interior-page fast path (default-off A/B probe): a grid step whose
    # whole [lo, hi) token range is visible to EVERY query row needs no
    # position mask — skipping the iota + compare + select chain removes
    # ~3 passes over the [G, BK] logits tile. On v5e this measured a WASH
    # (the DMA pipeline already hides those VPU passes; see the
    # fast_interior launcher docstring), so the masked chain stays the
    # default. The scalar predicate is exact: on-chip fast/masked outputs
    # are bit-identical (`jnp.where` with an all-true mask is the
    # identity; Mosaic preserves the rounding of the shared ops).
    fast = None
    if fast_interior:
        lo_s = j_act * block_kv
        hi_s = lo_s + block_kv
        limit_min = length - (q_tokens - 1)  # smallest per-row causal limit
        if compact:
            # Window phase: all pos must satisfy pos >= limit_r - window for
            # every row; the binding row is the LARGEST limit (= length).
            full_win = jnp.logical_and(
                hi_s <= limit_min,
                lo_s >= jnp.maximum(length - window, sink),
            )
            if sink_pages:
                # and/or composition (same Mosaic i1-select caveat as above)
                full_sink = hi_s <= jnp.minimum(sink, limit_min)
                fast = jnp.logical_or(
                    jnp.logical_and(is_sink_step, full_sink),
                    jnp.logical_and(jnp.logical_not(is_sink_step), full_win),
                )
            else:
                fast = full_win
        elif window is not None and window > 0:
            # Uncompacted windowed walk (compact_window=False A/B mode):
            # the predicate must mark EXACTLY the pages the compacted walk
            # marks, so the compaction bit-identity contract holds — a page
            # is fast iff it is a full sink page or lies wholly inside
            # every row's window (the straddle pages stay masked in both).
            fast = jnp.logical_and(
                hi_s <= limit_min,
                jnp.logical_or(
                    hi_s <= sink,
                    lo_s >= jnp.maximum(length - window, sink),
                ),
            )
        else:
            fast = hi_s <= limit_min

    if fast is not None:
        @pl.when(jnp.logical_and(live, fast))
        def _compute_fast():
            for t in range(heads_per_step):
                _head_block(t, masked=False)

        @pl.when(jnp.logical_and(live, jnp.logical_not(fast)))
        def _compute_masked():
            for t in range(heads_per_step):
                _head_block(t, masked=True)
    else:
        @pl.when(live)
        def _compute():
            for t in range(heads_per_step):
                _head_block(t)

    @pl.when(j == nj - 1)
    def _finalize():
        for t in range(heads_per_step):
            rows = slice(t * gp, (t + 1) * gp)
            l = l_scr[rows][:, :1]
            o_ref[0, t] = (acc_scr[rows] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)
            # Base-2 LSE of the local logits (rows with no valid tokens keep
            # m = NEG_INIT -> ~-inf weight in any cross-shard merge).
            lse_ref[0, t] = m_scr[rows][:, :1] + jnp.log2(jnp.where(l == 0.0, 1.0, l))


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_scale: jax.Array,
    lengths: jax.Array,
    *,
    v_scale: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    logit_cap: float = 0.0,
    block_kv: Optional[int] = None,
    kv_bits: int = 8,
    k_bits: Optional[int] = None,
    v_bits: Optional[int] = None,
    # Sliding window: attend only the last `window_size` cache rows of each
    # sequence (matches the prefill kernels' window semantics). Blocks
    # entirely below the window are predicated off AND their page DMAs are
    # clamped away, so decode streams O(window) bytes per token regardless
    # of context length.
    window_size: Optional[int] = None,
    # StreamingLLM attention sinks: with a window, cache rows [0, sink_size)
    # stay visible (their pages keep streaming; the gap between sink and
    # window is predicated off and DMA-clamped).
    sink_size: int = 0,
    # Windowed decode walks a COMPACTED page grid (sink pages + in-window
    # pages only) instead of predicating off below-window steps of the full
    # walk — O(window) grid steps per token regardless of context. False
    # only for A/B measurement of the dead-step cost.
    compact_window: bool = True,
    return_lse: bool = False,
    # Clamp the KV page walk to each sequence's pages-in-use so grid steps
    # past the length re-use the same block (no DMA issued) — batches mixing
    # short and long sequences stream each slot's actual pages. False only
    # for A/B measurement of the unclamped walk.
    clamp_walk: bool = True,
    # MXU operand domain. "auto" == "int_qk": an int8 K cache feeds the MXU
    # as stored codes (in-kernel per-row q quant, s8s8->s32 dot), deleting
    # the whole-tile f32 K upcast pass; results stay invariant to block
    # size/paging (the q codes are fixed per row). "int" additionally
    # requantizes the P row to int8 for a codes-on-codes PV dot — fastest
    # streaming but P requant error depends on the block partition, so it
    # is opt-in. "f32": always upcast (the r2 chain).
    compute_mode: str = "auto",
    # KV heads processed per grid step (clamped to a divisor of hk). More
    # heads per step = more DMA bytes per step, amortizing the fixed
    # per-step cost that bounds small-tile streaming (r3 A/B).
    heads_per_step: Optional[int] = None,
    # Unmasked compute on grid steps whose whole token range is visible to
    # every query row. Bit-identical to the masked chain on TPU Mosaic
    # (measured maxdiff 0.0 across bits/window/sink/multi-token modes; CPU
    # XLA shows ~1-ulp fusion drift) and measured a WASH on v5e — three
    # interleaved min-of-rounds A/Bs at 128K (full and W8K) read 1.17x,
    # 1.00x, 0.94x: sub-0.1 ms transport bimodality, no repeatable gain,
    # because the DMA-paced pipeline already hides the mask chain's VPU
    # passes (bench/fastpath_ab.py, FASTPATH_AB.json). Kept default-off as
    # an A/B probe for hardware where per-step compute paces the stream.
    fast_interior: bool = False,
    interpret: Optional[bool] = None,
):
    """Single-token decode attention over an int8/int4 KV cache (GQA/MQA).

    ``block_kv`` is the KV streaming block (and the page size when paged).
    Default: the paged path takes the cache's page size; the contiguous
    path consults the durable autotune cache (bench/autotune.py --space
    decode; bundled v5e winners: 128K int8 -> bk8192/hb2, k4v8 ->
    bk4096/hb4) and falls back to ``min(2048, ceil128(s_max))`` off-bucket,
    shrunk to the largest block dividing ``s_max`` (a non-dividing block
    forces a whole-cache pad copy per call). Block size matters because the
    int8 tiles' DMA per grid step must hide the fixed per-step cost —
    within-process sweep on v5e (b1 hk8 d128, 128K int8 cache, r3):
    2048 -> 543 GB/s, 4096 -> 662, 8192 -> 636 (later retuned to 8192 with
    hb2), 6144 -> 215 (non-pow2 tiling pathology); bf16, with 2x the bytes
    per step, is insensitive (739-744 across all blocks). Long-context
    serving deployments should prefer 4096-token pages when contexts
    allow; at 2048-token pages decode pays ~18%.

    Args:
      q: ``[B, H, D]`` float — current-token queries. OR ``[B, T, H, D]``
        for multi-token decode (speculative-verify): query token t attends
        ``pos < lengths[b] - (T - 1 - t)`` — i.e. ``lengths`` counts the
        cache INCLUDING all T new tokens, and each draft token sees its
        causal prefix. The T queries ride the kernel's sublane row dim
        (padded to 8 regardless), so verification streams the cache once
        at single-token cost.
      k_cache/v_cache: contiguous ``[B, Hk, S, D]``, or paged
        ``[Hk, n_pages, page, D]`` with ``page_table``. int8 codes (or float
        v_cache with ``v_scale=None``). With ``kv_bits=4`` (or per-cache
        ``k_bits``/``v_bits``) the corresponding cache's last dim is ``D//2``
        nibble-packed int4 codes (ops/quant.quant_int4 layout) — decode is HBM-bandwidth-bound, so halving the streamed
        bytes again nearly doubles long-context decode throughput (the
        in-kernel unpack is the TPU analog of the reference's fused 4-bit
        dequant loads, quant_sglang_triton_attn.py:43-243 / KIVI caches).
      k_scale / v_scale: per-token scales: ``[B, Hk, S]`` contiguous or
        ``[Hk, n_pages, page]`` paged.
      lengths: ``[B]`` int32 valid lengths.
      page_table: ``[B, max_pages]`` int32 physical page ids per sequence
        (reference ``Req_to_tokens``). Page size must equal ``block_kv``.
      logit_cap: >0 enables tanh logit capping.

    Returns ``[B, H, D]`` (or ``[B, T, H, D]``) in q.dtype.
    """
    if q.ndim == 4:
        b, q_tokens, h, d = q.shape
    else:
        b, h, d = q.shape
        q_tokens = 1
    k_bits = kv_bits if k_bits is None else k_bits
    v_bits = kv_bits if v_bits is None else v_bits
    # 16 = unquantized float cache (the bf16 baseline mode): full-width
    # K/V tiles on the f32 compute chain, scales expected to be ones.
    assert k_bits in (16, 8, 4) and v_bits in (16, 8, 4), (k_bits, v_bits)
    assert compute_mode in ("auto", "int", "int_qk", "f32"), compute_mode
    k_is_int = k_cache.dtype == jnp.int8
    # auto: int8-K streams codes straight to the MXU; packed int4-K keeps
    # the f32 chain (its nibble-unpack shifts already run in int32 and the
    # int8 half-dots measured a wash-to-slight-loss — DECODE_INT_AB r3).
    int_qk = (
        compute_mode in ("int", "int_qk")
        or (compute_mode == "auto" and k_bits == 8)
    ) and k_is_int
    int_pv = (
        compute_mode == "int" and v_cache.dtype == jnp.int8 and v_bits == 8
    )
    window = int(window_size) if window_size else 0
    assert window >= 0
    sink = int(sink_size) if window > 0 else 0
    paged = page_table is not None
    if block_kv is None:
        if paged:
            block_kv = k_cache.shape[2]  # the cache's page size
        else:
            # Durable autotune (bench/autotune.py --space decode) overrides
            # the measured heuristics per (cache bits, head_dim, pow2
            # context bucket); fallback = the r3 ~2MB/step heuristic below.
            from lowbit_quant_fa2_paddle_tpu.utils import tuning

            ent = None
            if not window:
                # Key on the ACTUAL cache precision (a float cache with the
                # default k_bits=8 declaration must not inherit the int8
                # winner: a bk8192 int8 tile fits VMEM, its bf16 twin does
                # not — measured OOM).
                ekb = 16 if k_cache.dtype != jnp.int8 else k_bits
                evb = 16 if v_cache.dtype != jnp.int8 else v_bits
                ent = tuning.lookup_entry(
                    f"decode_k{ekb}v{evb}", d,
                    tuning.pow2_bucket(k_cache.shape[2]), False,
                )
            if ent:
                block_kv = int(ent["block_kv"])
                if heads_per_step is None and "heads_per_step" in ent:
                    heads_per_step = int(ent["heads_per_step"])
            else:
                block_kv = min(2048, cdiv(k_cache.shape[2], 128) * 128)
            # A block that doesn't divide s_max forces a WHOLE-CACHE pad
            # copy per call (jnp.pad below) — at 128K that copy costs ~3x
            # the kernel itself (measured: the b1-tuned bk8192 applied to
            # a 130K cache regressed the LLM step 7.4 -> 16.9 ms/tok).
            # Shrink to the largest block that divides; per-block timing
            # is flat at these sizes (b4 A/B: 1.55-1.60 ms across
            # bk2048-8192), so the copy is the only thing at stake.
            while block_kv > 512 and k_cache.shape[2] % block_kv:
                block_kv //= 2
            # Windowed walk keeps the same 2048 default: the interleaved
            # min-of-rounds A/B at 128K/W8K int8 (single rounds flap
            # bimodally on this transport) reads bk2048 compact 53.5 us
            # vs bk1024 73.4 — the straddle waste is cheaper than more
            # grid steps.
    v_quantized = v_cache.dtype == jnp.int8
    if v_quantized:
        assert v_scale is not None
    if k_bits == 4:
        assert k_cache.shape[-1] == d // 2, (k_cache.shape, d)
    if v_bits == 4:
        assert v_quantized, "packed int4 V needs v_scale"
        assert v_cache.shape[-1] == d // 2, (v_cache.shape, d)
    d_ck = k_cache.shape[-1]  # packed width when k_bits == 4
    d_cv = v_cache.shape[-1]

    if paged:
        hk, n_pages, page, _ = k_cache.shape
        assert page == block_kv, (page, block_kv)
        max_pages = page_table.shape[1]
        k_rows, v_rows = k_cache, v_cache  # [Hk, Np, page, Dc]
        ks_rows = k_scale.reshape(hk, n_pages, 1, page)
        vs_rows = v_scale.reshape(hk, n_pages, 1, page) if v_quantized else None

        def row0(bi, hi):
            return hi
    else:
        _, hk, s_max, _ = k_cache.shape
        s_pad = cdiv(s_max, block_kv) * block_kv
        if s_pad != s_max:
            pad4 = ((0, 0), (0, 0), (0, s_pad - s_max), (0, 0))
            k_cache = jnp.pad(k_cache, pad4)
            v_cache = jnp.pad(v_cache, pad4)
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, s_pad - s_max)))
            if v_quantized:
                v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, s_pad - s_max)))
            s_max = s_pad
        max_pages = s_max // block_kv
        page_table = jnp.broadcast_to(
            jnp.arange(max_pages, dtype=jnp.int32), (b, max_pages)
        )
        # contiguous cache viewed as pages: rows are (b*hk + h)
        k_rows = k_cache.reshape(b * hk, max_pages, block_kv, d_ck)
        v_rows = v_cache.reshape(b * hk, max_pages, block_kv, d_cv)
        ks_rows = k_scale.reshape(b * hk, max_pages, 1, block_kv)
        vs_rows = (
            v_scale.reshape(b * hk, max_pages, 1, block_kv) if v_quantized else None
        )

        def row0(bi, hi):
            # dim0 indexes [b*hk] rows in heads_per_step-block units
            return bi * (hk // hb) + hi

    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = default_interpret()
    assert h % hk == 0, f"GQA requires num_q_heads ({h}) divisible by num_kv_heads ({hk})"
    if heads_per_step is None:
        # Auto: batch KV heads until one grid step moves ~2 MB — the point
        # where the fixed per-step cost stops eating stream rate (measured
        # r3, b1 hk8 d128 128K int8: bk2048 x hb4 = 678 GB/s vs the r2
        # hb1 x bk2048 = 543; bf16 already moves 2 MB at bk4096 x hb1 and
        # is insensitive). More than ~2 MB shows no further gain.
        step_bytes = block_kv * (
            d_ck * k_cache.dtype.itemsize + d_cv * v_cache.dtype.itemsize + 8
        )  # codes/rows + f32 scale rows
        heads_per_step = cdiv(2 << 20, max(step_bytes, 1))
    hb = max(1, min(heads_per_step, hk))
    while hk % hb:  # round UP to the next divisor of hk (more DMA, not less)
        hb += 1
    g = h // hk
    rows = q_tokens * g  # query rows per kv head: token-major, group-minor
    g_pad = max(8, cdiv(rows, 8) * 8)
    if q_tokens > 1:
        # [B,T,H,D] -> [B,Hk, T*g, D] with row r = t*g + group_head.
        qg = (
            q.astype(jnp.float32)
            .reshape(b, q_tokens, hk, g, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, hk, rows, d)
        )
    else:
        qg = q.astype(jnp.float32).reshape(b, hk, g, d)
    if g_pad != rows:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - rows), (0, 0)))

    # Compacted banded walk (windowed decode): the page grid dim is shrunk
    # to the STATIC count of pages a window can touch — sink pages plus
    # ceil((window + q_tokens - 1)/block_kv) + 1 straddle — instead of the
    # full cache walk with below-window steps predicated off. Dead grid
    # steps cost ~2 us each even DMA-clamped (r3: 128K/W8K decode measured
    # 0.093 ms/tok vs the 0.025 byte-ratio floor); compaction deletes them.
    # The prefill kernels solved the same problem with scalar-prefetched
    # band tables (ops/attention.py); decode derives the band from
    # `lengths` directly in the index map.
    sink_pages = cdiv(sink, block_kv) if (window and sink) else 0
    compact = False
    if window and compact_window and clamp_walk:
        n_band = sink_pages + cdiv(window + q_tokens - 1, block_kv) + 1
        compact = n_band < max_pages
    grid_pages = n_band if compact else max_pages

    def logical_page(bi, ji, lens):
        used_m1 = jnp.maximum(
            jax.lax.div(lens[bi] + (block_kv - 1), block_kv) - 1, 0
        )
        if compact:
            start = jnp.maximum(lens[bi] - (q_tokens - 1) - window, 0)
            ws = jnp.maximum(start, sink) // block_kv
            j_act = ws + (ji - sink_pages)
            if sink_pages:
                j_act = jnp.where(ji < sink_pages, ji, j_act)
            return jnp.clip(j_act, 0, used_m1)
        if not clamp_walk:
            return ji
        # Clamp the page walk to the sequence's pages-in-use: grid steps
        # past the length keep the SAME block index, so Mosaic's pipeline
        # skips their DMAs entirely (the compute is already `pl.when`-
        # masked). A batch mixing 2K and 128K sequences then streams
        # each slot's actual pages, not table_width pages per slot.
        jc = jnp.minimum(ji, used_m1)
        if window:
            # (uncompacted windowed walk — compact_window=False A/B mode)
            # Below-window steps reuse the first in-window page: their
            # compute is predicated off, and the repeated index lets
            # Mosaic skip the DMA entirely. Sink pages keep streaming.
            j_lo = jnp.maximum(lens[bi] - (q_tokens - 1) - window, 0) // block_kv
            jw = jnp.maximum(jc, jnp.minimum(j_lo, used_m1))
            jc = jnp.where(ji * block_kv < sink, jc, jw) if sink else jw
        return jc

    def row_index(bi, hi, ji, lens, tbl):
        return (row0(bi, hi), tbl[bi, logical_page(bi, ji, lens)], 0, 0)

    in_specs = [
        pl.BlockSpec((1, hb, g_pad, d), lambda bi, hi, ji, lens, tbl: (bi, hi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, 1, block_kv, d_ck), row_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, 1, 1, block_kv), row_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, 1, block_kv, d_cv), row_index, memory_space=pltpu.VMEM),
    ]
    args = [qg, k_rows, ks_rows, v_rows]
    if v_quantized:
        in_specs.append(pl.BlockSpec((hb, 1, 1, block_kv), row_index, memory_space=pltpu.VMEM))
        args.append(vs_rows)

    def kernel(lengths_ref, table_ref, *refs):
        if v_quantized:
            q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, lse_ref, m_s, l_s, a_s = refs
        else:
            q_ref, k_ref, ks_ref, v_ref, o_ref, lse_ref, m_s, l_s, a_s = refs
            vs_ref = None
        _decode_kernel(
            lengths_ref, table_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
            o_ref, lse_ref, m_s, l_s, a_s,
            block_kv=block_kv, logit_cap=logit_cap, sm_scale=float(sm_scale),
            v_quantized=v_quantized, k_bits=k_bits, v_bits=v_bits,
            int_qk=int_qk, int_pv=int_pv, heads_per_step=hb,
            window=window, sink=sink, q_tokens=q_tokens, group=g,
            compact=compact, sink_pages=sink_pages,
            fast_interior=fast_interior,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hk // hb, grid_pages),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, hb, g_pad, d), lambda bi, hi, ji, lens, tbl: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, g_pad, 1), lambda bi, hi, ji, lens, tbl: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hb * g_pad, 128), jnp.float32),
            pltpu.VMEM((hb * g_pad, 128), jnp.float32),
            pltpu.VMEM((hb * g_pad, d), jnp.float32),
        ],
    )

    out, lse2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hk, g_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, hk, g_pad, 1), jnp.float32),
        ],
        # Only the page dim carries the online-softmax scratch; batch/head
        # are parallel so multi-core generations (megacore) can split them.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), *args)
    if q_tokens > 1:
        o = (
            out[:, :, :rows]
            .reshape(b, hk, q_tokens, g, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, q_tokens, h, d)
        )
        if return_lse:
            lse = (
                lse2[:, :, :rows, 0]
                .reshape(b, hk, q_tokens, g)
                .transpose(0, 2, 1, 3)
                .reshape(b, q_tokens, h)
            )
            return o, lse
        return o
    o = out[:, :, :g].reshape(b, h, d)
    if return_lse:
        # Base-2 LSE per (b, head) — the cross-shard merge contract
        # (parallel/serving.py), mirroring the prefill kernels' LSE export.
        return o, lse2[:, :, :g, 0].reshape(b, h)
    return o


# ---------------------------------------------------------------------------
# Quantized KV cache ops (reference new_pack.py qcache helpers)
# ---------------------------------------------------------------------------


def init_kv_cache(
    b: int, hk: int, s_max: int, d: int, *, bits: int = 8,
    k_bits: Optional[int] = None, v_bits: Optional[int] = None,
) -> dict:
    """Contiguous int8 (or nibble-packed int4) KV cache with per-token
    scales. ``k_bits``/``v_bits`` override ``bits`` per cache side (e.g. the
    KIVI-style mixed config K=4 V=8). ``bits=16`` builds the unquantized
    bf16 baseline cache (scales stay ones)."""
    k_bits = bits if k_bits is None else k_bits
    v_bits = bits if v_bits is None else v_bits
    assert k_bits in (16, 8, 4) and v_bits in (16, 8, 4), (k_bits, v_bits)

    def buf(nbits):
        if nbits == 16:
            return jnp.zeros((b, hk, s_max, d), jnp.bfloat16)
        return jnp.zeros((b, hk, s_max, d if nbits == 8 else d // 2), jnp.int8)

    return {
        "k": buf(k_bits),
        "v": buf(v_bits),
        "k_scale": jnp.ones((b, hk, s_max), jnp.float32),
        "v_scale": jnp.ones((b, hk, s_max), jnp.float32),
        "length": jnp.zeros((b,), jnp.int32),
    }


def quantize_token(x: jax.Array, *, bits: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric quant of new-token K/V rows ``[B, Hk, D]``.
    ``bits=4`` returns nibble-packed ``[B, Hk, D//2]`` codes (halves-of-D
    layout, matching ops/quant.quant_int4). ``bits=16`` stores raw bf16
    rows with unit scales (the unquantized baseline cache)."""
    if bits == 16:
        return x.astype(jnp.bfloat16), jnp.ones(x.shape[:-1], jnp.float32)
    qmax = INT8_QMAX if bits == 8 else 7.0
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / qmax + EPS
    codes = jnp.clip(round_away(x.astype(jnp.float32) / scale), -qmax, qmax)
    if bits == 4:
        c32 = codes.astype(jnp.int32)
        d = x.shape[-1]
        lo = c32[..., : d // 2] & 0xF
        hi = c32[..., d // 2 :] & 0xF
        return (lo | (hi << 4)).astype(jnp.int8), scale[..., 0]
    return codes.astype(jnp.int8), scale[..., 0]


def cache_bits(buf: jax.Array, new_row: jax.Array) -> int:
    """Infer a cache side's bit depth from its dtype/packed width (kept out
    of the dict so the cache stays a pure array pytree under jit)."""
    if buf.dtype != jnp.int8:
        return 16
    return 8 if buf.shape[-1] == new_row.shape[-1] else 4


def append_kv(cache: dict, k_new: jax.Array, v_new: jax.Array) -> dict:
    """Quantize and append one token's K/V ``[B, Hk, D]`` at each sequence's
    current length (the streaming-cache role of the reference's
    quant_and_pack_kcache/vcache, new_pack.py:9-144)."""
    kq, ks = quantize_token(k_new, bits=cache_bits(cache["k"], k_new))
    vq, vs = quantize_token(v_new, bits=cache_bits(cache["v"], v_new))
    length = cache["length"]

    def upd_codes(buf, val):
        def one(buf_i, val_i, pos):  # buf_i [Hk,S,D], val_i [Hk,D]
            return jax.lax.dynamic_update_slice(buf_i, val_i[:, None, :], (0, pos, 0))
        return jax.vmap(one)(buf, val, length)

    def upd_scale(buf, val):
        def one(buf_i, val_i, pos):  # buf_i [Hk,S], val_i [Hk]
            return jax.lax.dynamic_update_slice(buf_i, val_i[:, None], (0, pos))
        return jax.vmap(one)(buf, val, length)

    return {
        "k": upd_codes(cache["k"], kq),
        "v": upd_codes(cache["v"], vq),
        "k_scale": upd_scale(cache["k_scale"], ks),
        "v_scale": upd_scale(cache["v_scale"], vs),
        "length": length + 1,
    }


def append_kv_multi(cache: dict, k_new: jax.Array, v_new: jax.Array) -> dict:
    """Quantize and append T tokens' K/V ``[B, Hk, T, D]`` at each
    sequence's current length — the speculative-verify twin of
    :func:`append_kv` (per-token scales are position-independent, so the
    T appended rows are bit-identical to appending them one at a time)."""
    t = k_new.shape[2]
    kq, ks = quantize_token(k_new, bits=cache_bits(cache["k"], k_new))
    vq, vs = quantize_token(v_new, bits=cache_bits(cache["v"], v_new))
    length = cache["length"]

    def upd_codes(buf, val):
        def one(buf_i, val_i, pos):  # buf_i [Hk,S,D], val_i [Hk,T,D]
            return jax.lax.dynamic_update_slice(buf_i, val_i, (0, pos, 0))
        return jax.vmap(one)(buf, val, length)

    def upd_scale(buf, val):
        def one(buf_i, val_i, pos):  # buf_i [Hk,S], val_i [Hk,T]
            return jax.lax.dynamic_update_slice(buf_i, val_i, (0, pos))
        return jax.vmap(one)(buf, val, length)

    return {
        "k": upd_codes(cache["k"], kq),
        "v": upd_codes(cache["v"], vq),
        "k_scale": upd_scale(cache["k_scale"], ks),
        "v_scale": upd_scale(cache["v_scale"], vs),
        "length": length + t,
    }
