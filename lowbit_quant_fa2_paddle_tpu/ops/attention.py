"""Low-bit FlashAttention-2 Pallas kernels for TPU.

One templated kernel family replaces the reference's entire kernel zoo
(Triton src/triton/attn_qk_int8_per_block*.py, quantization/attn_qk_int4_*,
CUDA csrc/qattn/qk_int_sv_f16_cuda.cu / qk_int_sv_f8_cuda.cu): the axes of
variation become kernel-factory flags instead of separate files —

* QK operand type: INT8 codes, nibble-packed INT4 codes (unpacked in-kernel
  on the VPU before the MXU dot), or floating (bf16/fp32 — the FA2 baseline);
* PV operand: float V, or per-channel INT8 V whose scale/mean are fused into
  the epilogue (the TPU analog of the reference's FP8-PV path with fused
  v_scale / v_mean, csrc/qattn/qk_int_sv_f8_cuda.cu:557-576);
* causal via a scalar-prefetched TRIANGULAR grid — only at-or-below-diagonal
  blocks are scheduled (true block/DMA skipping; the reference's two-stage
  split only early-outs compute, attn_qk_int8_per_block_causal.py:45-79);
* GQA head mapping via BlockSpec index maps (reference num_kv_groups,
  attn_qk_int8_per_block.py:104-119);
* varlen via segment-id masks — the TPU-idiomatic replacement for cu_seqlens
  ragged pointers (reference attn_qk_int8_block_varlen.py);
* LSE output in base-2 (reference convention, "for cases like Ring
  Attention", src/core.py:123-125).

Design notes (TPU-first, not a port):
- Online softmax runs in base 2 (`exp2`), with ``sm_scale * log2(e)`` folded
  into the per-token Q scale by the wrapper — same trick as the reference
  (quant_per_block.py:213-229) but applied to the f32 scale row, not inside
  the quant kernel.
- Dequantization of the int32 QK product is a rank-1 (outer product) rescale:
  ``s = i32 * q_scale[:, None] * k_scale[None, :]`` — per-token scales cost
  the same as the reference's coarser per-block scales here, so per-token is
  the default granularity (it subsumes the accuracy role of the reference's
  per-warp/per-thread scales without any warp-layout gymnastics).
- PV accumulates in fp32 **natively on the MXU**, so the reference's
  fp16+fp32-buffer machinery (qk_int_sv_f16_buffer_cuda.cu) is unnecessary;
  ``pv_dtype`` only selects the P/V operand precision fed to the MXU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops.quant import cdiv, default_interpret
from lowbit_quant_fa2_paddle_tpu.utils import tuning

LOG2E = math.log2(math.e)
LOG2_127 = math.log2(127.0)
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
STATS_WIDTH = 128  # lane width of the m/l scratch rows
NEG_INIT = -1e30


# Layout note: per-row vectors (scales, segment ids, LSE) cross the kernel
# boundary in *column* layout [..., S, 1] when the kernel needs a [BLK, 1]
# sublane-major column, and in *row* layout [..., 1, S] when it needs a
# [1, BLK] lane-major row. Both reinterpretations of a [.., S] array are free
# reshapes outside the kernel, and neither needs an in-kernel relayout.


def _unpack_int4_halves(packed: jax.Array, axis: int = -1) -> jax.Array:
    """Nibble-packed int4 int8 codes -> int8 values, doubling ``axis``
    (halves-of-D scheme: low nibble of byte i is feature i, high nibble is
    feature i + D/2; see ops/quant.py packing notes). ``axis`` is the packed
    feature axis — -1 for natural [N, D/2] tiles, 0 for pre-transposed
    [D/2, N] tiles.

    Shifts run in int32 — Mosaic cannot legalize vector shifts on i8 — and
    the sign-extended int32 nibbles are truncated back to int8 for the MXU
    dot."""
    p32 = packed.astype(jnp.int32)  # sign-extends the byte
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(p32, 4)  # signed high nibble
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.int8)


def _unpack_int2_quarters(packed: jax.Array, axis: int = -1) -> jax.Array:
    """2-bit codes, four per byte in quarters-of-D order -> int8."""
    p32 = packed.astype(jnp.int32)
    parts = [
        jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 30 - 2 * i), 30)
        for i in range(4)
    ]
    return jnp.concatenate(parts, axis=axis).astype(jnp.int8)


def _tri_schedule(
    nq: int,
    nk_blocks: int,
    block_q: int,
    block_kv: int,
    window: int = 0,
    q_offset: int = 0,
    sink: int = 0,
):
    """Scalar-prefetch tables for the causal triangular grid — or, with
    ``window`` > 0 (sliding-window attention), the causal BAND: one entry
    per (q-block, kv-block) pair that intersects the mask, plus a
    first/last-visit flag word (bit 1 = first kv block of this q row,
    bit 0 = last). With a band the first visited kv block of a row is no
    longer block 0, so first-visit must travel in the table rather than be
    inferred from ``j == 0``. Shared by both kernel schedules so the two
    can never desynchronize. Work drops from O(S^2/2) to O(S*W).

    ``sink`` > 0 (StreamingLLM attention sinks) additionally visits the
    leading blocks covering keys [0, sink) for every q row — the window's
    anchor tokens. ``q_offset`` shifts every q position globally (ring
    attention: at hop t the visiting KV shard sits t*s_local behind the
    local Q shard, so the cross-shard band is this same schedule at
    q_offset = t*s_local). A q block whose band is empty still gets ONE
    fully-masked visit so its init/finalize run and it emits the
    (o=0, lse=NEG_INIT) zero-weight contract the ring merge expects."""
    i_list, j_list, flag_list = [], [], []
    sink_blocks = cdiv(sink, block_kv) if (sink > 0 and window > 0) else 0
    for qi in range(nq):
        lo_q = qi * block_q + q_offset
        hi_q = lo_q + block_q - 1
        j_max = min(nk_blocks, cdiv(hi_q + 1, block_kv))
        j_min = 0
        if window > 0:
            # Lowest key any q row of this block attends: q_min - window + 1.
            j_min = max(0, (lo_q - window + 1) // block_kv)
        if j_min >= j_max:
            # Empty band (possible only with q_offset): one masked visit.
            j_min = j_max = max(j_max, 1)
            j_min -= 1
        js = list(range(min(sink_blocks, j_min))) + list(range(j_min, j_max))
        for pos, ki in enumerate(js):
            i_list.append(qi)
            j_list.append(ki)
            flag_list.append(
                (2 if pos == 0 else 0) | (1 if pos == len(js) - 1 else 0)
            )
    return (
        jnp.asarray(np.array(i_list, np.int32)),
        jnp.asarray(np.array(j_list, np.int32)),
        jnp.asarray(np.array(flag_list, np.int32)),
        len(i_list),
    )


def _im_tri(f):
    """Index-map wrapper for the triangular grid (scalar-prefetch args)."""
    return lambda bi, hi, ti, itb, jtb, ltb: f(bi, hi, itb[ti], jtb[ti])


def _im_rect(f):
    return lambda bi, hi, qi, ki: f(bi, hi, qi, ki)


# Measured per-row efficiency of the K-major non-causal schedule by q-block
# size (b4 h32 d64 s4096, v5e: 6.20 / 6.43 / 6.68 ms at 4096/2048/1024; 512
# extrapolated). Larger tiles amortize per-block overhead, but a partial edge
# q-block computes its full padded height — so the default minimizes
# padded_rows * per_row_cost instead of blindly taking the largest tile
# (e.g. s=17776: bq4096 pads 15%, bq2048 wins).
_KM_BQ_EFF = ((4096, 1.0), (2048, 1.037), (1024, 1.077), (512, 1.12))


def _pick_block_q_km(s_q: int, d: int) -> int:
    best, best_cost = 1024, None
    for bq, f in _KM_BQ_EFF:
        if d > 64 and bq > 2048:
            continue  # hd128 VMEM headroom: f32 logits tile + doubled acc
        cost = cdiv(s_q, bq) * bq * f
        if best_cost is None or cost < best_cost:
            best, best_cost = bq, cost
    return best


def _attn_kernel_rect(*refs, k_major: bool = False, **params):
    """Rectangular grid (b, h, nq, nk): the non-causal schedule."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    body = _attn_body_km if k_major else _attn_body
    body(i, j, j == 0, j == nk - 1, refs, **params)


def _attn_kernel_tri(i_tbl, j_tbl, flag_tbl, *refs, k_major: bool = False, **params):
    """Triangular/banded grid for causal (+ sliding window): grid dim 2
    walks scalar-prefetched (i, j) tables covering ONLY mask-intersecting
    blocks, so causal runs ~half the DMA and grid steps of the rectangular
    schedule and a sliding window runs O(S*W) of them (true block
    skipping — the reference's STAGE-1/2 split merely early-outs compute,
    attn_qk_int8_per_block_causal.py:45-79)."""
    t = pl.program_id(2)
    i = i_tbl[t]
    j = j_tbl[t]
    f = flag_tbl[t]
    body = _attn_body_km if k_major else _attn_body
    body(i, j, (f & 2) != 0, (f & 1) != 0, refs, **params)


def _attn_body_km(
    i,
    j,
    is_first,
    is_last,
    refs,
    *,
    kv_len: int,
    block_q: int,
    block_kv: int,
    causal: bool,
    window: int = 0,
    q_offset: int = 0,
    sink: int = 0,
    quantized_qk: bool,
    fused_quant_q: bool = False,
    k_pack_bits: int,
    v_quantized: bool,
    pv_int8: bool = False,
    v_natural: bool = False,
    smooth_v: bool,
    has_segments: bool,
    has_bias: bool,
    logit_cap: float,
    sm_scale_log2e: float,
    pv_dtype,
    mask_v_edge: bool = False,
    softmax_dtype=None,
    ks_uniform: bool = False,
    mask_split: bool = True,
    **_unused,
):
    """K-major (transposed-space) block: the hd64 performance schedule.

    The Q-major block is bound by its serial VPU softmax chain plus a PV dot
    whose N = head_dim = 64 output uses half the MXU lanes (PERFORMANCE.md
    ablations). Transposing the whole block fixes both ends at once:

      s^T = K[BK,D] @ Q^T[D,BQ]   — K in NATURAL layout (no transpose pass
                                    anywhere); Q^T codes come straight from
                                    ``quant_int8(layout="ds")``;
      m/l = reduce over axis 0    — the softmax max/sum run in the SUBLANE
                                    direction (elementwise vreg ops), not as
                                    cross-lane shuffle reductions;
      o^T += V^T[D,BK] @ P^T[BK,BQ] — N = BQ (full 128 output lanes; the
                                    Q-major PV at N=64 runs at half rate).

    Output is O^T ``[B,H,D,S]``; model consumers fold the transpose into the
    next matmul's dimension numbers (free on the MXU), drop-in callers pay one
    XLA transpose. Measured (b4 h32 hd64 s4096, int8): 84.8 vs 68.9 TF
    Q-major — 1.23x, bit-identical output. Role of the reference kernels'
    layout tricks (csrc/qattn/permuted_smem.cuh swizzles): get the data the
    shape the matrix unit wants, here at block rather than smem granularity.
    """
    it = iter(refs)
    q_ref = next(it)  # [D, BQ]; NATURAL float [BQ, D] when fused_quant_q
    k_ref = next(it)  # [BK, Dk] natural
    v_ref = next(it)  # [D, BK] transposed
    qs_ref = ks_ref = None
    if fused_quant_q:
        ks_ref = next(it)  # K externally quantized; Q quantized in-kernel
    elif quantized_qk:
        qs_ref = next(it)  # [1, BQ] row
        ks_ref = next(it)  # [BK, 1] column
    vs_ref = vm_ref = None
    if v_quantized:
        vs_ref = next(it)  # [D, 1] column
    if smooth_v:
        vm_ref = next(it)  # [D, 1] column
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref = next(it)  # [1, BQ] row
        kseg_ref = next(it)  # [BK, 1] column
    bias_ref = None
    if has_bias:
        bias_ref = next(it)  # [BK, BQ] tile or [BK, 1] column (per-key)
    o_ref = next(it)
    lse_ref = next(it)
    m_scr = next(it)  # [SUB, BQ] rows (replicated over sublanes)
    l_scr = next(it)
    acc_scr = next(it)  # [D, BQ]
    q8_scr = qs_scr = None
    if fused_quant_q:
        q8_scr = next(it)  # [D, BQ] int8
        qs_scr = next(it)  # [SUB, BQ] (replicated)

    @pl.when(is_first)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if fused_quant_q:
            # Hoisted in-kernel Q quantization + relayout (the K-major twin
            # of the Q-major hybrid, see _attn_body._init): the q tile is
            # constant across this grid row, so once per q-block quantize
            # per-token AND transpose [BQ, D] -> [D, BQ] in VMEM (same
            # ``codes.T`` relayout the quant kernel's layout="ds" uses).
            # This deletes both the external Q quant kernel's HBM round trip
            # and the whole-tensor XLA Q^T transpose pass.
            qfT = q_ref[0, 0].astype(jnp.float32).T  # [D, BQ]
            qa = jnp.max(jnp.abs(qfT), axis=0, keepdims=True) / 127.0 + 1e-7
            q8_scr[...] = jnp.clip(
                jax.lax.round(qfT / qa, jax.lax.RoundingMethod.AWAY_FROM_ZERO),
                -127.0, 127.0,
            ).astype(jnp.int8)
            qs_scr[...] = jnp.broadcast_to(qa * sm_scale_log2e, qs_scr.shape)

    if causal:
        should_run = j * block_kv <= i * block_q + block_q - 1 + q_offset
        if window > 0:
            # Sliding window: blocks entirely below the band are skipped too
            # (rect-grid predication; the tri grid skips them in the table),
            # except attention-sink blocks (keys < sink stay visible).
            in_band = j * block_kv + block_kv - 1 >= i * block_q + q_offset - window + 1
            if sink > 0:
                in_band = jnp.logical_or(in_band, j * block_kv < sink)
            should_run = jnp.logical_and(should_run, in_band)
    else:
        should_run = True

    # softmax_dtype=bf16 runs the WHOLE logit chain (dequant, max, shift,
    # exp2) on bf16 tiles. Measured a LOSS on v5e (7.71 vs 6.40 ms at the
    # headline config): the VPU does not run bf16 elementwise 2x, and the
    # extra casts cost more than the narrower tiles save. Kept as an
    # opt-in experiment knob for other generations (bench/exp_round2.py).
    sm_dt = softmax_dtype if softmax_dtype is not None else jnp.float32
    bf16_softmax = pv_dtype == jnp.bfloat16 or (v_quantized and pv_int8)
    quant = quantized_qk or fused_quant_q
    # fold_p127: true INT8 P@V with the x127 requant folded into the exp2
    # shift — the TPU analog of the reference FP8 path's S_FP8_OFFSET
    # exponent-bias trick (csrc/qattn/qk_int_sv_f8_cuda.cu:30-32, applied
    # at softmax and un-done at normalize). pT comes out of exp2 already
    # scaled to [0, 127]; l accumulates the SAME quantized weights, so the
    # 127 cancels exactly in acc/l and only the LSE needs the -log2(127).
    fold_p127 = v_quantized and pv_int8
    kv_edge = kv_len % block_kv != 0
    # Fast chain: uniform-per-tile K scale (scales positive => they factor
    # out of the max), no bias/cap, no mask. The tile max runs in the INT32
    # domain and the two dequant multiplies collapse into one [1, BQ] row
    # feeding a single fused multiply-subtract before exp2 — 2 fewer VPU
    # passes over the [BK, BQ] tile, which is where this kernel's issue
    # slots go (PERFORMANCE.md ablations).
    fast_ok = quant and ks_uniform and not has_bias and logit_cap == 0.0

    def _block(masked: bool):
        qT = q8_scr[...] if fused_quant_q else q_ref[0, 0]  # [D, BQ]
        k = k_ref[0, 0]   # [BK, Dk]
        if k_pack_bits == 4:
            # K natural [BK, D/2]: halves-of-D nibble unpack along the lane
            # (feature) axis — the same scheme as ops/quant nibble packing.
            k = _unpack_int4_halves(k)
        elif k_pack_bits == 2:
            k = _unpack_int2_quarters(k)

        m_prev = m_scr[...]
        if quant:
            sI = jax.lax.dot_general(
                k, qT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            q_row = qs_scr[...][:1] if fused_quant_q else qs_ref[0, 0]
        if fast_ok and not masked:
            cq = ks_ref[0, 0][:1] * q_row          # [1, BQ] combined scale
            m_curr = jnp.max(sI, axis=0, keepdims=True).astype(jnp.float32) * cq
            m_next = jnp.maximum(m_prev, m_curr)
            shift = (m_next - LOG2_127) if fold_p127 else m_next
            x = sI.astype(jnp.float32) * cq - shift[:1]
            pT = jnp.exp2(x.astype(jnp.bfloat16) if bf16_softmax else x)
        else:
            if quant:
                sT = sI.astype(sm_dt)
                sT = sT * ks_ref[0, 0].astype(sm_dt) * q_row.astype(sm_dt)
            else:
                sT = jax.lax.dot_general(
                    k, qT, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(sm_dt)
                sT = sT * jnp.asarray(sm_scale_log2e, sm_dt)

            if has_bias:
                b_t = bias_ref[0, 0]
                sT = sT + b_t  # pre-scaled to base-2 by the launcher
            if logit_cap > 0.0:
                c2 = logit_cap * LOG2E
                sT = c2 * jnp.tanh(sT / c2)

            mask = None
            if masked and causal:
                kvrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0) + j * block_kv
                qcol = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1)
                    + i * block_q + q_offset
                )
                mask = kvrow <= qcol
                if window > 0:
                    # q attends keys in (q - window, q] — Mistral-class
                    # sliding window, window tokens including self — plus
                    # the sink anchors [0, sink) (StreamingLLM).
                    inw = kvrow + window > qcol
                    if sink > 0:
                        inw = jnp.logical_or(inw, kvrow < sink)
                    mask = jnp.logical_and(mask, inw)
            if masked and kv_edge:
                # [BK, 1] column predicate — broadcasts over q lanes, so the
                # edge block pays a vector (not tile) iota+compare.
                kvrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0) + j * block_kv
                inb = kvrow < kv_len
                mask = inb if mask is None else jnp.logical_and(mask, inb)
            if masked and has_segments:
                seg = kseg_ref[0] == qseg_ref[0]  # [BK,1] vs [1,BQ]
                mask = seg if mask is None else jnp.logical_and(mask, seg)
            if mask is not None:
                sT = jnp.where(mask, sT, MASK_VALUE)

            m_curr = jnp.max(sT, axis=0, keepdims=True).astype(jnp.float32)
            m_next = jnp.maximum(m_prev, m_curr)
            shift = (m_next - LOG2_127) if fold_p127 else m_next
            # Keep the full-tile subtract in the softmax dtype (a f32 m would
            # silently upcast the whole [BK,BQ] tile).
            shifted = sT - shift[:1].astype(sm_dt)
            pT = jnp.exp2(shifted.astype(jnp.bfloat16) if bf16_softmax else shifted)

        alpha = jnp.exp2(m_prev - m_next)
        if fold_p127:
            # Round-to-nearest via +0.5 then truncating convert; max value
            # 127.49 -> 127 (no overflow). l sums the SAME quantized weights
            # so normalization is self-consistent with the PV dot.
            p8 = (pT + jnp.asarray(0.5, pT.dtype)).astype(jnp.int8)
            l_curr = jnp.sum(
                p8, axis=0, keepdims=True, dtype=jnp.int32
            ).astype(jnp.float32)
        else:
            l_curr = jnp.sum(pT, axis=0, keepdims=True, dtype=jnp.float32)
        l_scr[...] = alpha * l_scr[...] + l_curr
        m_scr[...] = m_next

        v_t = v_ref[0, 0]  # [D, BK] transposed, or [BK, D] when v_natural
        if mask_v_edge:
            cols_left = kv_len - j * block_kv
            kv_axis = 0 if v_natural else 1
            vec_shape = (v_t.shape[0], 1) if v_natural else (1, v_t.shape[1])
            vkv = jax.lax.broadcasted_iota(jnp.int32, vec_shape, kv_axis)
            v_t = jnp.where(vkv < cols_left, v_t, 0)
        # v_natural consumes the NATURAL [BK, D] tile by contracting ITS
        # dim 0 in the dot's dimension numbers — no transpose materializes;
        # trades the whole-tensor V^T HBM pass for the MXU's [K, M]-layout
        # lhs feed. Measure both (hw_runbook) — layout rates differ.
        dnums = (((0,), (0,)), ((), ())) if v_natural else (((1,), (0,)), ((), ()))
        if fold_p127:
            pv = jax.lax.dot_general(
                v_t, p8, dnums, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
        else:
            pv = jax.lax.dot_general(
                v_t.astype(pv_dtype),
                pT.astype(pv_dtype),
                dnums,
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = acc_scr[...] * alpha[:1] + pv

    @pl.when(should_run)
    def _compute():
        # Split blocks that can need masking from those that can't, so
        # interior blocks (the bulk) skip the iota/where passes and take the
        # fast chain. Segment masks can land anywhere -> always masked.
        if has_segments:
            _block(True)
            return
        dyn = None
        if mask_split:
            if causal:
                # Mask needed iff the block straddles the diagonal: its
                # largest kv row exceeds its smallest q column.
                dyn = j * block_kv + block_kv - 1 > i * block_q + q_offset
                if window > 0:
                    # ...or straddles the band's lower edge: some (q, kv)
                    # pair in the block is window or more apart. Sink
                    # blocks sit outside the band -> always masked.
                    low = (
                        i * block_q + block_q - 1 + q_offset - j * block_kv
                        >= window
                    )
                    dyn = jnp.logical_or(dyn, low)
            if kv_edge:
                e = j == cdiv(kv_len, block_kv) - 1
                dyn = e if dyn is None else jnp.logical_or(dyn, e)
        if dyn is None:
            _block(causal or kv_edge)
        else:
            @pl.when(dyn)
            def _masked():
                _block(True)

            @pl.when(jnp.logical_not(dyn))
            def _unmasked():
                _block(False)

    @pl.when(is_last)
    def _finalize():
        l = l_scr[...][:1]  # [1, BQ]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o = acc_scr[...] / l_safe
        if v_quantized:
            o = o * vs_ref[0, 0]  # [D, 1] column scale
        if smooth_v:
            # Rows with zero valid keys keep the zero-output contract —
            # the mean add only applies where softmax actually ran.
            o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[0, 0]
        o_ref[0, 0] = o.astype(o_ref.dtype)
        m = m_scr[...][:1]
        # Zero-valid-key rows emit the NEG_INIT sentinel so LSE-weighted
        # recombination (ring) gives them weight 0. With fold_p127, l carries
        # the x127 softmax-weight scale — undo it in the LSE only (it cancels
        # in acc/l), mirroring the reference FP8 path's offset subtraction
        # (csrc/qattn/qk_int_sv_f8_cuda.cu:689).
        lse = m + jnp.log2(l_safe)
        if v_quantized and pv_int8:
            lse = lse - LOG2_127
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INIT, lse)


def _attn_body(
    i,
    j,
    is_first,
    is_last,
    refs,
    *,
    kv_len: int,
    block_q: int,
    block_kv: int,
    causal: bool,
    window: int = 0,
    q_offset: int = 0,
    sink: int = 0,
    tri: bool = False,
    static_max: bool = False,
    quantized_qk: bool,
    fused_quant: bool = False,
    fused_quant_q: bool = False,
    smooth_k_fused: bool = False,
    fused_k_qmax: float = 127.0,
    k_pack_bits: int,
    v_quantized: bool,
    pv_int8: bool,
    smooth_v: bool,
    has_segments: bool,
    has_bias: bool,
    logit_cap: float,
    sm_scale_log2e: float,
    pv_dtype,
    mask_v_edge: bool = False,
    mask_split: bool = True,
):
    # --- unpack refs in the fixed order the launcher builds them ---
    it = iter(refs)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    qs_ref = ks_ref = km_ref = None
    if fused_quant:
        if smooth_k_fused:
            km_ref = next(it)
    elif fused_quant_q:
        ks_ref = next(it)  # K externally quantized; Q quantized in-kernel
    elif quantized_qk:
        qs_ref = next(it)
        ks_ref = next(it)
    vs_ref = vm_ref = None
    if v_quantized:
        vs_ref = next(it)
    if smooth_v:
        vm_ref = next(it)
    qseg_ref = kseg_ref = None
    if has_segments:
        qseg_ref = next(it)
        kseg_ref = next(it)
    bias_ref = None
    if has_bias:
        bias_ref = next(it)
    mstat_ref = None
    if static_max:
        mstat_ref = next(it)
    o_ref = next(it)
    lse_ref = next(it)
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)
    q8_scr = qs_scr = None
    if fused_quant or fused_quant_q:
        q8_scr = next(it)
        qs_scr = next(it)

    @pl.when(is_first)
    def _init():
        if not static_max:
            m_scr[...] = jnp.full_like(m_scr, NEG_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if fused_quant or fused_quant_q:
            # Hoisted in-kernel Q quantization: the q tile is the same for
            # every KV block of this grid row, so quantize ONCE per q-block
            # into scratch instead of per (i, j) visit. Per-visit the ~7-op
            # quant chain on [BQ, D] costs ~8% of the kernel's serial VPU
            # path (measured: hybrid without hoisting 41.8 ms vs 38.7
            # external at s17776); hoisted it is O(S) — noise. Math is
            # identical to ops/quant.quant_int8(gran="per_token").
            qf = q_ref[0, 0].astype(jnp.float32)
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0 + 1e-7
            q8_scr[...] = jnp.clip(
                jax.lax.round(qf / qa, jax.lax.RoundingMethod.AWAY_FROM_ZERO),
                -127.0, 127.0,
            ).astype(jnp.int8)
            qs_scr[...] = jnp.broadcast_to(qa * sm_scale_log2e, qs_scr.shape)

    if causal and not tri:
        # Rect fallback: skip blocks above the diagonal via predication.
        should_run = j * block_kv <= i * block_q + block_q - 1 + q_offset
        if window > 0:
            in_band = j * block_kv + block_kv - 1 >= i * block_q + q_offset - window + 1
            if sink > 0:
                in_band = jnp.logical_or(in_band, j * block_kv < sink)
            should_run = jnp.logical_and(should_run, in_band)
    else:
        should_run = True

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]  # [BQ, D] int8 | float
        # K arrives pre-transposed [D(, /pack), BK] — the [K, N]-layout MXU
        # feed runs ~40% faster than contracting dim 1 of a [BK, D] tile
        # (measured: int8 295 vs 210 TOPS, bf16 240 vs 152 TF at D=64).
        kt = k_ref[0, 0]
        if fused_quant or fused_quant_q:
            # Q codes/scale come from the hoisted per-q-block quant in _init.
            q = q8_scr[...]
            qs_tile = qs_scr[...][:, :1]  # [BQ, 1] (includes sm_scale*log2e)
        if fused_quant:
            # K tiles change every (i, j) visit, so K's in-kernel quant
            # cannot be hoisted — this O(S^2) rework is the full-fused
            # mode's ~8% kernel cost, paid to delete the external K quant
            # kernel's HBM round trip (wins below the s~4k crossover).
            ktf = kt.astype(jnp.float32)  # [D, BK]
            if km_ref is not None:
                ktf = ktf - km_ref[0, 0]  # smooth-K: km column [D, 1]
            # fused_k_qmax = 7 gives the INT4-K accuracy class with no
            # pack/unpack at all (packing only ever halved HBM bytes; here
            # K arrives as bf16 and codes never leave VMEM).
            ka = jnp.max(jnp.abs(ktf), axis=0, keepdims=True) / fused_k_qmax + 1e-7
            kt = jnp.clip(
                jax.lax.round(ktf / ka, jax.lax.RoundingMethod.AWAY_FROM_ZERO),
                -fused_k_qmax, fused_k_qmax,
            ).astype(jnp.int8)
            ks_tile = ka  # [1, BK]
        elif fused_quant_q:
            # Hybrid: Q from scratch (above), K consumed as external codes —
            # external K quant is O(S) with pre-transposed output, external
            # Q quant's HBM round trip is deleted. The long-seq sweet spot.
            ks_tile = ks_ref[0, 0]  # [1, BK]
        if k_pack_bits == 4:
            kt = _unpack_int4_halves(kt, axis=0)  # [D, BK]
        elif k_pack_bits == 2:
            kt = _unpack_int2_quarters(kt, axis=0)

        if quantized_qk:
            s = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            if fused_quant or fused_quant_q:
                qs, ks = qs_tile, ks_tile
            else:
                qs = qs_ref[0, 0]  # [BQ, 1] column (includes sm_scale*log2e)
                ks = ks_ref[0, 0]  # [1, BK] row
            s = s * qs * ks
        else:
            s = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = s * sm_scale_log2e

        if has_bias:
            # bias pre-scaled by log2(e) in the launcher (kernel is base-2).
            s = s + bias_ref[0, 0]
        if logit_cap > 0.0:
            # tanh capping in natural space (reference quant_sglang logit_cap)
            c2 = logit_cap * LOG2E
            s = c2 * jnp.tanh(s / c2)

        # When PV consumes bf16 anyway, run exp2 (and the [BQ,BK] tail of
        # the softmax) in bf16: the exp2 argument is <= 0, so the absolute
        # bf16 rounding bounds the relative error of p at ~ln2*2^-9 — cos
        # impact ~1e-6, VPU passes on the [BQ,BK] tile halve (+~5% kernel).
        bf16_softmax = pv_dtype == jnp.bfloat16 or (v_quantized and pv_int8)
        # fold_p127: true INT8 P@V with the x127 requant folded into the
        # exp2 shift (the reference FP8 S_FP8_OFFSET analog — see the
        # K-major twin). l sums the SAME quantized weights, so 127 cancels
        # in acc/l; the finalize LSE subtracts log2(127).
        fold_p127 = v_quantized and pv_int8
        kv_edge = kv_len % block_kv != 0

        def _tail(masked: bool):
            ss = s
            mask = None
            if masked and causal:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                    + i * block_q + q_offset
                )
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + j * block_kv
                mask = col <= row
                if window > 0:
                    # Sliding window: q attends keys in (q - window, q],
                    # plus the sink anchors [0, sink) (StreamingLLM).
                    inw = col + window > row
                    if sink > 0:
                        inw = jnp.logical_or(inw, col < sink)
                    mask = jnp.logical_and(mask, inw)
            if masked and kv_edge:
                # [1, BK] row predicate — broadcasts over q rows, so the
                # edge block pays a vector (not tile) iota+compare.
                col = jax.lax.broadcasted_iota(jnp.int32, (1, block_kv), 1) + j * block_kv
                inb = col < kv_len
                mask = inb if mask is None else jnp.logical_and(mask, inb)
            if masked and has_segments:
                qseg = qseg_ref[0]  # [BQ, 1] column
                kseg = kseg_ref[0]  # [1, BK] row
                seg = qseg == kseg
                mask = seg if mask is None else jnp.logical_and(mask, seg)
            if mask is not None:
                ss = jnp.where(mask, ss, MASK_VALUE)

            off = LOG2_127 if fold_p127 else 0.0
            alpha = None
            if static_max:
                # m_static is the launcher's Cauchy-Schwarz per-row logit
                # bound (see the launcher note) — it overshoots the true row
                # max by only a few base-2 units, absorbed by the f32/bf16
                # exponent after exp2. The whole online-max machinery (max
                # reduce, alpha, accumulator rescale) vanishes: softmax
                # becomes one shifted exp2 + plain accumulation.
                shifted = ss - (mstat_ref[0, 0] - off)  # [BQ,BK] - [BQ,1]
                p = jnp.exp2(shifted.astype(jnp.bfloat16) if bf16_softmax else shifted)
            else:
                m_prev = m_scr[...]  # [BQ, 128] (replicated)
                m_curr = jnp.max(ss, axis=-1, keepdims=True)  # [BQ, 1]
                m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
                alpha = jnp.exp2(m_prev - m_next)  # [BQ, 128]
                shifted = ss - (m_next[:, :1] - off)
                p = jnp.exp2(shifted.astype(jnp.bfloat16) if bf16_softmax else shifted)
                m_scr[...] = m_next
            if fold_p127:
                # Round-to-nearest via +0.5 then truncating convert; max
                # value 127.49 -> 127 (no overflow).
                p8 = (p + jnp.asarray(0.5, p.dtype)).astype(jnp.int8)
                l_curr = jnp.sum(
                    p8, axis=-1, keepdims=True, dtype=jnp.int32
                ).astype(jnp.float32)
            else:
                l_curr = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            if static_max:
                l_scr[...] = l_scr[...] + jnp.broadcast_to(l_curr, l_scr.shape)
            else:
                l_scr[...] = alpha * l_scr[...] + jnp.broadcast_to(l_curr, l_scr.shape)

            v = v_ref[0, 0]  # [BK, D] float | int8
            if masked and mask_v_edge:
                # Seq dims are not physically padded; the edge KV block reads
                # whatever lies past the array end. p for those columns is
                # exactly 0 (masked to MASK_VALUE pre-exp2), but 0 * NaN =
                # NaN would still poison the accumulator through P@V, so
                # float V garbage rows are zeroed here (int8 V is finite).
                # Edge blocks always take the masked branch.
                rows_left = kv_len - j * block_kv
                vrow = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1), 0)
                v = jnp.where(vrow < rows_left, v, 0)
            if fold_p127:
                pv = jax.lax.dot_general(
                    p8, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                ).astype(jnp.float32)
            else:
                pv = jax.lax.dot_general(
                    p.astype(pv_dtype),
                    v.astype(pv_dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            if static_max:
                acc_scr[...] = acc_scr[...] + pv
            else:
                acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

        # Mask-split (K-major twin): interior blocks skip the iota/where
        # passes. Segment masks can land anywhere -> always masked.
        if has_segments:
            _tail(True)
        else:
            dyn = None
            if mask_split:
                if causal:
                    dyn = j * block_kv + block_kv - 1 > i * block_q + q_offset
                    if window > 0:
                        low = (
                            i * block_q + block_q - 1 + q_offset - j * block_kv
                            >= window
                        )
                        dyn = jnp.logical_or(dyn, low)
                if kv_edge:
                    e = j == cdiv(kv_len, block_kv) - 1
                    dyn = e if dyn is None else jnp.logical_or(dyn, e)
            if dyn is None:
                _tail(causal or kv_edge)
            else:
                @pl.when(dyn)
                def _masked():
                    _tail(True)

                @pl.when(jnp.logical_not(dyn))
                def _unmasked():
                    _tail(False)

    @pl.when(is_last)
    def _finalize():
        l = l_scr[...][:, :1]  # [BQ, 1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o = acc_scr[...] / l_safe
        if v_quantized:
            # Per-channel V scale commutes through P@V -> epilogue rescale
            # (the reference's fused v_scale, qk_int_sv_f8_cuda.cu:557-576).
            o = o * vs_ref[0, 0]  # [1, D] row
        if smooth_v:
            # softmax rows sum to 1 -> adding back the channel mean is a
            # plain add (reference fused v_mean epilogue; also valid with
            # float V, reference sageattn_qk_int8_pv_fp16_cuda smooth_v).
            # Rows with zero valid keys keep the zero-output contract.
            o = o + jnp.where(l == 0.0, 0.0, 1.0) * vm_ref[0, 0]
        o_ref[0, 0] = o.astype(o_ref.dtype)
        m = mstat_ref[0, 0] if static_max else m_scr[...][:, :1]
        # Zero-valid-key rows emit the NEG_INIT sentinel in BOTH softmax
        # modes (static_max's m is a finite bound, not the running max) so
        # LSE-weighted recombination (ring) gives them weight 0. fold_p127's
        # x127 weight scale cancels in acc/l; only the LSE undoes it.
        lse2 = m + jnp.log2(l_safe)  # base-2
        if v_quantized and pv_int8:
            lse2 = lse2 - LOG2_127
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INIT, lse2)  # [BQ, 1] column


def lowbit_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_scale: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    *,
    v_scale: Optional[jax.Array] = None,
    v_mean: Optional[jax.Array] = None,
    fused_quant: bool = False,
    # Hybrid: Q (float) quantized in-kernel per-token, K consumed as external
    # int8/int4 codes with ``k_scale``. The long-sequence sweet spot — see
    # the kernel note.
    fused_quant_q: bool = False,
    fused_k_bits: int = 8,
    k_mean: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    k_packed_int4: bool = False,
    k_pack_bits: int = 8,
    # K arrives already transposed [B, Hk, Dk, Sk] (e.g. straight from
    # quant_int8(layout="ds")) — skips the whole-tensor XLA int8 transpose
    # between quant and attention.
    k_transposed: bool = False,
    # Sliding-window (local causal) attention: each q attends the previous
    # ``window_size`` keys including itself — positions in (q - W, q].
    # Requires ``is_causal``; the triangular grid narrows to the band, so
    # work is O(S*W) not O(S^2/2). With varlen segments the window applies
    # to packed positions, which equal within-segment distances for
    # contiguously packed segments. (Beyond the reference — its kernels
    # have no local-attention mode.)
    window_size: Optional[int] = None,
    # StreamingLLM attention sinks: with a window, keys [0, sink_size)
    # stay visible to every q (the softmax anchor tokens). The banded grid
    # additionally visits the leading sink blocks.
    sink_size: int = 0,
    # Global position of q row 0 relative to kv row 0 (static). Ring
    # attention's cross-shard hops: at hop t every local Q shard sits
    # t*s_local past the visiting KV shard, so causal/window masks and the
    # banded schedule reuse this kernel with q_position_offset = t*s_local.
    q_position_offset: int = 0,
    logit_cap: float = 0.0,
    static_max: bool = False,
    # int8 P@V is opt-in: on v5e the [BQ,BK] p-requantization pass costs
    # more VPU time than the int8 MXU rate saves (video e2e: 0.74x vs fp
    # with it, ~parity without), and bf16 P@V is also more accurate
    # (cos 0.9998 vs 0.9994 at hd128). Generations whose int8 MXU advantage
    # outweighs a VPU pass can flip it back on.
    pv_int8: bool = False,
    # Mask-split (skip iota/where on interior blocks via a pl.when pair)
    # HURTS the Q-major schedule on v5e (within-process A/B, fp causal
    # s4096: 5.89 vs 5.24 ms — the duplicated tail outweighs the saved
    # passes); the K-major kernel defaults it ON (small win there).
    mask_split: bool = False,
    pv_dtype=jnp.bfloat16,
    block_q: int = 1024,
    block_kv: int = 1024,
    out_dtype=None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Launch the templated low-bit attention kernel. HND layout only.

    Args:
      q: ``[B, H, Sq, D]`` — int8 codes (quantized path) or bf16/fp32 (FA2
        baseline path; then ``q_scale``/``k_scale`` must be None).
      k: ``[B, Hk, Sk, D]`` int8 / float, or ``[B, Hk, Sk, D//2]`` packed int4
        when ``k_packed_int4``.
      v: ``[B, Hk, Sk, D]`` float, or int8 with ``v_scale`` (+ optional
        ``v_mean``) per channel ``[B, Hk, D]``.
      q_scale / k_scale: per-token scale rows ``[B, H, Sq]`` / ``[B, Hk, Sk]``
        (f32). ``sm_scale`` and the base-2 conversion are folded into
        ``q_scale`` here, NOT by the caller.
      Returns ``o`` (``[B, H, Sq, D]``) and, when ``return_lse``, the base-2
        LSE ``[B, H, Sq]`` of the *scaled* logits (callers convert to natural
        log and apply the smooth-K correction — reference src/core.py:344-350).
    """
    b, h, s_q, d_q = q.shape
    if k_transposed:
        _, h_kv, _, s_k = k.shape
    else:
        _, h_kv, s_k, _ = k.shape
    d = v.shape[-1]
    quantized_qk = q_scale is not None or fused_quant or fused_quant_q
    if fused_quant:
        # In-kernel quantization consumes FLOAT q/k (see the kernel note);
        # ``k_mean`` [B,Hk,1,D] enables fused smooth-K.
        assert q_scale is None and k_scale is None, "fused_quant quantizes in-kernel"
        assert k_pack_bits == 8 and not k_packed_int4
        assert q.dtype != jnp.int8 and k.dtype != jnp.int8
    if fused_quant_q:
        assert not fused_quant
        assert q_scale is None and k_scale is not None
        assert q.dtype != jnp.int8 and k.dtype == jnp.int8
    if not quantized_qk:
        assert q.dtype != jnp.int8 and k.dtype != jnp.int8, (
            "int8 q/k codes require q_scale/k_scale — the float FA2 path "
            "would silently misread codes as values"
        )
    elif not fused_quant and not fused_quant_q:
        assert q_scale is not None and k_scale is not None, (
            "quantized path needs BOTH q_scale and k_scale"
        )
    if k_packed_int4:
        k_pack_bits = 4
    if sm_scale is None:
        # Scale by the QK contraction dim, not V's head dim (they can differ).
        sm_scale = 1.0 / math.sqrt(d_q)
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if quantized_qk or v.dtype == jnp.int8 else v.dtype
    assert h % h_kv == 0, (
        f"GQA requires num_q_heads ({h}) divisible by num_kv_heads ({h_kv})"
    )
    group = h // h_kv
    v_quantized = v.dtype == jnp.int8
    smooth_v = v_mean is not None
    has_segments = q_segment_ids is not None
    has_bias = bias is not None
    # static_max replaces the online running max with a per-row STATIC logit
    # bound m_i = qs_i*|qc_i|_2 * max_j(ks_j*|kc_j|_2) (Cauchy-Schwarz on the
    # integer codes). Unlike the worst-case 127^2*D bound — which overshoots
    # the true max by ~100 base-2 units and underflows everything — the CS
    # bound overshoots by ~1/cos(angle(q,k)), a few logit units, trivially
    # absorbed by the f32/bf16 exponent. This deletes the max reduce, the
    # alpha correction, and the accumulator rescale from the kernel's serial
    # chain. Sound only when nothing else can push logits above the bound
    # (no bias, no tanh rescale) and for unpacked int8 K (packed K would
    # need an unpack pass to get norms). It yields unnormalized p, so the
    # int8-P PV path is disabled with it.
    static_max = (
        static_max
        and quantized_qk
        and not fused_quant  # needs external codes for the CS bound
        and not fused_quant_q
        and logit_cap == 0.0
        and not has_bias
        and k_pack_bits == 8
    )
    if static_max:
        pv_int8 = False

    block_q = min(block_q, max(128, s_q))
    block_kv = min(block_kv, max(128, s_k))

    # Seq dims are NOT physically padded to block multiples: Pallas handles
    # partial edge blocks (masked stores), the kv_len mask below covers edge
    # KV columns, garbage Q edge rows are row-isolated and their stores
    # masked, and float-V edge garbage is zeroed in-kernel (mask_v_edge).
    # This deletes whole-tensor pad + slice HBM copies on every
    # non-block-multiple call (e.g. the 17776-token CogVideoX shape).
    if quantized_qk and not fused_quant and not fused_quant_q:
        q_scale = (q_scale * (sm_scale * LOG2E)).astype(jnp.float32)
    if k_scale is not None:
        k_scale = k_scale.astype(jnp.float32)

    q_off = int(q_position_offset)
    assert q_off == 0 or is_causal, "q_position_offset is a causal-mask shift"
    window = 0
    if window_size is not None:
        assert is_causal, "window_size requires is_causal (causal sliding window)"
        assert window_size >= 1
        # No-op only when the window covers every (q, kv) distance.
        window = int(window_size) if window_size < s_q + q_off else 0
    sink = int(sink_size) if window > 0 else 0

    nq, nk_blocks = cdiv(s_q, block_q), cdiv(s_k, block_kv)
    mask_v_edge = s_k % block_kv != 0 and v.dtype != jnp.int8
    # Triangular (true block-skip) schedule for causal; rectangular otherwise.
    tri = bool(is_causal) and nq > 1
    if tri:
        i_tbl, j_tbl, last_tbl, n_steps = _tri_schedule(
            nq, nk_blocks, block_q, block_kv, window, q_off, sink
        )
        grid = (b, h, n_steps)
        IM = _im_tri
    else:
        grid = (b, h, nq, nk_blocks)
        IM = _im_rect

    if k_transposed:
        d_k = k.shape[2]  # packed width when int4/int2
        k_t = k
    else:
        d_k = k.shape[-1]
        k_t = jnp.swapaxes(k, 2, 3)  # [B, Hk, Dk, Sk] — see kernel QK note
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d_q), IM(lambda bi, hi, qi, ki: (bi, hi, qi, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d_k, block_kv), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, ki)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_kv, d), IM(lambda bi, hi, qi, ki: (bi, hi // group, ki, 0)), memory_space=pltpu.VMEM),
    ]
    args = [q, k_t, v]
    if fused_quant:
        if k_mean is not None:
            # km travels as a [B,Hk,D,1] column to match the kt [D,BK] tile.
            km_t = jnp.swapaxes(k_mean.astype(jnp.float32), 2, 3)
            in_specs.append(
                pl.BlockSpec((1, 1, d_q, 1), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, 0)), memory_space=pltpu.VMEM)
            )
            args.append(km_t)
    elif fused_quant_q:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, block_kv), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, ki)), memory_space=pltpu.VMEM)
        )
        args.append(k_scale[:, :, None, :])
    elif quantized_qk:
        # q_scale as a column [B,H,Sq,1]; k_scale as a row [B,Hk,1,Sk].
        in_specs += [
            pl.BlockSpec((1, 1, block_q, 1), IM(lambda bi, hi, qi, ki: (bi, hi, qi, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_kv), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, ki)), memory_space=pltpu.VMEM),
        ]
        args += [q_scale[..., None], k_scale[:, :, None, :]]
    if v_quantized:
        assert v_scale is not None
        in_specs.append(pl.BlockSpec((1, 1, 1, d), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, 0)), memory_space=pltpu.VMEM))
        args.append(v_scale.astype(jnp.float32)[:, :, None, :])
    if smooth_v:
        in_specs.append(pl.BlockSpec((1, 1, 1, d), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, 0)), memory_space=pltpu.VMEM))
        args.append(v_mean.astype(jnp.float32)[:, :, None, :])
    if has_segments:
        # q segments as a column [B,Sq,1]; kv segments as a row [B,1,Sk].
        in_specs += [
            pl.BlockSpec((1, block_q, 1), IM(lambda bi, hi, qi, ki: (bi, qi, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv), IM(lambda bi, hi, qi, ki: (bi, 0, ki)), memory_space=pltpu.VMEM),
        ]
        args += [
            q_segment_ids.astype(jnp.int32)[:, :, None],
            kv_segment_ids.astype(jnp.int32)[:, None, :],
        ]
    if has_bias:
        # Additive attention bias in natural-log units; vector [B,H,1,Sk]
        # (e.g. ALiBi-style per-key) or full matrix [B,H,Sq,Sk] (reference
        # attn_4bit_per_block.py bias support). Pre-scale to base-2.
        bias = (bias.astype(jnp.float32) * LOG2E)
        if bias.shape[2] == 1:
            in_specs.append(
                pl.BlockSpec((1, 1, 1, block_kv), IM(lambda bi, hi, qi, ki: (bi, hi, 0, ki)), memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((1, 1, block_q, block_kv), IM(lambda bi, hi, qi, ki: (bi, hi, qi, ki)), memory_space=pltpu.VMEM)
            )
        args.append(bias)
    if static_max:
        # Cauchy-Schwarz per-row bound (see note above); one cheap XLA pass
        # over the codes.
        q_norm = jnp.sqrt(
            jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)
        )  # [B,H,Sq]
        k_norm = jnp.sqrt(
            jnp.sum(jnp.square(k.astype(jnp.float32)), axis=2 if k_transposed else -1)
        )  # [B,Hk,Sk]
        k_max = jnp.max(k_scale * k_norm, axis=2)  # [B, Hk]
        k_max = jnp.repeat(k_max, group, axis=1)  # [B, H]
        m_static = q_scale * q_norm * k_max[:, :, None]
        in_specs.append(
            pl.BlockSpec((1, 1, block_q, 1), IM(lambda bi, hi, qi, ki: (bi, hi, qi, 0)), memory_space=pltpu.VMEM)
        )
        args.append(m_static[..., None])

    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), IM(lambda bi, hi, qi, ki: (bi, hi, qi, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), IM(lambda bi, hi, qi, ki: (bi, hi, qi, 0)), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, s_q, d), out_dtype),
        jax.ShapeDtypeStruct((b, h, s_q, 1), jnp.float32),
    ]

    params = dict(
        kv_len=s_k,
        block_q=block_q,
        block_kv=block_kv,
        causal=is_causal,
        window=window,
        q_offset=q_off,
        sink=sink,
        tri=tri,
        static_max=static_max,
        quantized_qk=quantized_qk,
        fused_quant=fused_quant,
        fused_quant_q=fused_quant_q,
        smooth_k_fused=fused_quant and k_mean is not None,
        fused_k_qmax=127.0 if fused_k_bits == 8 else 7.0,
        k_pack_bits=k_pack_bits,
        v_quantized=v_quantized,
        pv_int8=pv_int8,
        smooth_v=smooth_v,
        has_segments=has_segments,
        has_bias=has_bias,
        logit_cap=float(logit_cap),
        sm_scale_log2e=float(sm_scale) * LOG2E,
        pv_dtype=pv_dtype,
        mask_v_edge=mask_v_edge,
        mask_split=bool(mask_split),
    )

    # Causal halves the average work per kv row; reflect it in the cost
    # estimate so XLA schedules neighbours sensibly.
    flops = 4 * b * h * (nq * block_q) * (nk_blocks * block_kv) * d * (0.5 if is_causal else 1.0)
    if window:
        # Banded grid visits ~window+block_kv keys per q row, not s_k/2.
        flops = int(flops * min(1.0, (window + block_kv) / max(1, s_k) * 2.0))
    cost = pl.CostEstimate(
        flops=int(flops),
        bytes_accessed=int(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize
            + v.size * v.dtype.itemsize
        ),
        transcendentals=int(b * h * nq * block_q * nk_blocks * block_kv),
    )
    scratch_shapes = [
        pltpu.VMEM((block_q, STATS_WIDTH), jnp.float32),
        pltpu.VMEM((block_q, STATS_WIDTH), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    if fused_quant or fused_quant_q:
        # Hoisted Q-quant scratch: codes + scale, written once per q-block.
        scratch_shapes += [
            pltpu.VMEM((block_q, d_q), jnp.int8),
            pltpu.VMEM((block_q, STATS_WIDTH), jnp.float32),
        ]
    if tri:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        o, lse2 = pl.pallas_call(
            functools.partial(_attn_kernel_tri, **params),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(i_tbl, j_tbl, last_tbl, *args)
    else:
        o, lse2 = pl.pallas_call(
            functools.partial(_attn_kernel_rect, **params),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(*args)

    if return_lse:
        return o, lse2[:, :, :, 0]
    return o


def lowbit_attention_km(
    qT: jax.Array,
    k: jax.Array,
    vT: jax.Array,
    q_scale: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    *,
    v_scale: Optional[jax.Array] = None,
    v_mean: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    is_causal: bool = False,
    # Sliding-window (local causal) attention — see ``lowbit_attention``.
    window_size: Optional[int] = None,
    # StreamingLLM attention sinks — see ``lowbit_attention``.
    sink_size: int = 0,
    # Static global shift of q positions vs kv row 0 (ring cross-shard
    # hops) — see ``lowbit_attention``.
    q_position_offset: int = 0,
    sm_scale: Optional[float] = None,
    k_packed_int4: bool = False,
    k_pack_bits: int = 8,
    fused_quant_q: bool = False,
    pv_int8: bool = False,
    v_natural: bool = False,
    logit_cap: float = 0.0,
    softmax_dtype=None,
    k_scale_uniform: bool = False,
    mask_split: bool = True,
    pv_dtype=jnp.bfloat16,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    out_dtype=None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """K-major (transposed-space) attention — the hd64 fast path.

    Default blocks are schedule-dependent (on-chip sweep, b4 h32 d64 s4096,
    v5e): non-causal (4096, 512) — 6.20 ms vs 6.55 at the old (2048, 512);
    causal (1024, 1024) — 4.42 ms vs 5.49 (the triangular grid skips
    1 - (nq+1)/(2·nk·bq/bk...) of the blocks, so causal wants SQUARE blocks:
    at bq2048/bk512 and s4096 only 25% of blocks are skipped, at
    bq1024/bk1024 it is 37.5%). Both sit at the VMEM ceiling
    bq*bk <= 2M (the f32 logits tile; larger tiles fail Mosaic compile).

    ``k_scale_uniform=True`` asserts that ``k_scale`` is constant within
    every ``block_kv`` row window (e.g. per-block quantization with the
    quant block equal to ``block_kv``). Unmasked quantized blocks then take
    a shorter VPU chain: int32-domain tile max + one combined scale row —
    see ``_attn_body_km``. Results are wrong if the promise is broken.

    See ``_attn_body_km`` for the schedule rationale (full-lane PV, sublane
    softmax reductions; 1.23x over the Q-major kernel at b4h32 s4096 hd64,
    bit-identical output).

    Layouts (all "transposed" relative to ``lowbit_attention``):
      qT: ``[B, H, D, Sq]`` int8 codes (straight from
          ``quant_int8(layout="ds")``) or float. With ``fused_quant_q``,
          pass NATURAL-layout float Q ``[B, H, Sq, D]`` instead: the kernel
          quantizes per-token and relayouts to [D, BQ] in VMEM, hoisted once
          per q-block (``q_scale`` must be None; ``k_scale`` still required —
          K codes stay external since their quant is O(S) with no transpose).
      k:  ``[B, Hk, Sk, Dk]`` — NATURAL layout (no transpose pass anywhere);
          ``Dk = D/2`` when ``k_packed_int4``.
      vT: ``[B, Hk, D, Sk]`` float, or int8 with per-channel ``v_scale``
          (+ optional ``v_mean``) ``[B, Hk, D]``.
      Returns O^T ``[B, H, D, Sq]`` (+ base-2 LSE ``[B, H, Sq]``). Model
      consumers fold O^T into the next matmul's dimension numbers; drop-in
      wrappers transpose once.
    """
    if fused_quant_q:
        assert q_scale is None and k_scale is not None, (
            "fused_quant_q quantizes Q in-kernel; K must be external codes"
        )
        b, h, s_q, d = qT.shape
    else:
        b, h, d, s_q = qT.shape
    _, h_kv, s_k, d_k = k.shape
    quantized_qk = q_scale is not None
    if not quantized_qk and not fused_quant_q:
        assert qT.dtype != jnp.int8 and k.dtype != jnp.int8, (
            "int8 q/k codes require q_scale/k_scale — the float FA2 path "
            "would silently misread codes as values"
        )
    elif quantized_qk:
        assert k_scale is not None, "quantized path needs BOTH q_scale and k_scale"
    if k_packed_int4:
        k_pack_bits = 4
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = (
            jnp.bfloat16
            if quantized_qk or fused_quant_q or vT.dtype == jnp.int8
            else vT.dtype
        )
    assert h % h_kv == 0
    group = h // h_kv
    v_quantized = vT.dtype == jnp.int8
    smooth_v = v_mean is not None
    has_segments = q_segment_ids is not None
    has_bias = bias is not None

    if block_q is None or block_kv is None:
        # Durable autotune results (bench/autotune.py --save) override the
        # built-in measured defaults for exactly-matching shapes (the cache
        # key includes the device kind, so CPU/interpret runs never pick up
        # TPU-tuned blocks and vice versa).
        tuned = tuning.lookup("km", d, s_k, is_causal)
        if tuned is not None:
            tq, tk = tuned
            block_q = tq if block_q is None else block_q
            block_kv = tk if block_kv is None else block_kv
        else:
            if block_q is None:
                if is_causal:
                    # Square (1024,1024) maximizes triangular-grid block
                    # skipping; beyond ~16K the diagonal overhang amortizes
                    # and the bigger tile wins (s32768: 83.5 vs 80.7 TF).
                    block_q = 2048 if s_q > 16384 else 1024
                else:
                    block_q = _pick_block_q_km(s_q, d)
            if block_kv is None:
                # bk1024 beats bk512 at every measured shape that fits the
                # bq*bk <= 2M VMEM cap (d64 s2048: 80.5 vs 79.3 TF; d128
                # s4096: 149.9 vs 145.1; d128 s1024: 129.8 vs 113.8); only
                # the bq4096 long-seq d64 tile needs the narrower 512.
                block_kv = 1024 if is_causal else (512 if block_q >= 4096 else 1024)
    block_q = min(block_q, max(128, s_q))
    block_kv = min(block_kv, max(128, s_k))

    if quantized_qk:
        q_scale = (q_scale * (sm_scale * LOG2E)).astype(jnp.float32)
        k_scale = k_scale.astype(jnp.float32)

    q_off = int(q_position_offset)
    assert q_off == 0 or is_causal, "q_position_offset is a causal-mask shift"
    window = 0
    if window_size is not None:
        assert is_causal, "window_size requires is_causal (causal sliding window)"
        assert window_size >= 1
        window = int(window_size) if window_size < s_q + q_off else 0
    sink = int(sink_size) if window > 0 else 0

    nq, nk_blocks = cdiv(s_q, block_q), cdiv(s_k, block_kv)
    mask_v_edge = s_k % block_kv != 0 and vT.dtype != jnp.int8
    tri = bool(is_causal) and nq > 1
    if tri:
        i_tbl, j_tbl, last_tbl, n_steps = _tri_schedule(
            nq, nk_blocks, block_q, block_kv, window, q_off, sink
        )
        grid = (b, h, n_steps)
        IM = _im_tri
    else:
        grid = (b, h, nq, nk_blocks)
        IM = _im_rect

    if fused_quant_q:
        q_spec = pl.BlockSpec((1, 1, block_q, d), IM(lambda bi, hi, qi, ki: (bi, hi, qi, 0)), memory_space=pltpu.VMEM)
    else:
        q_spec = pl.BlockSpec((1, 1, d, block_q), IM(lambda bi, hi, qi, ki: (bi, hi, 0, qi)), memory_space=pltpu.VMEM)
    if v_natural:
        v_spec = pl.BlockSpec((1, 1, block_kv, d), IM(lambda bi, hi, qi, ki: (bi, hi // group, ki, 0)), memory_space=pltpu.VMEM)
    else:
        v_spec = pl.BlockSpec((1, 1, d, block_kv), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, ki)), memory_space=pltpu.VMEM)
    in_specs = [
        q_spec,
        pl.BlockSpec((1, 1, block_kv, d_k), IM(lambda bi, hi, qi, ki: (bi, hi // group, ki, 0)), memory_space=pltpu.VMEM),
        v_spec,
    ]
    args = [qT, k, vT]
    if fused_quant_q:
        in_specs.append(
            pl.BlockSpec((1, 1, block_kv, 1), IM(lambda bi, hi, qi, ki: (bi, hi // group, ki, 0)), memory_space=pltpu.VMEM)
        )
        args.append(k_scale.astype(jnp.float32)[..., None])
    elif quantized_qk:
        # q_scale as a ROW [B,H,1,Sq]; k_scale as a COLUMN [B,Hk,Sk,1].
        in_specs += [
            pl.BlockSpec((1, 1, 1, block_q), IM(lambda bi, hi, qi, ki: (bi, hi, 0, qi)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_kv, 1), IM(lambda bi, hi, qi, ki: (bi, hi // group, ki, 0)), memory_space=pltpu.VMEM),
        ]
        args += [q_scale[:, :, None, :], k_scale[..., None]]
    if v_quantized:
        assert v_scale is not None
        in_specs.append(pl.BlockSpec((1, 1, d, 1), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, 0)), memory_space=pltpu.VMEM))
        args.append(v_scale.astype(jnp.float32)[..., None])
    if smooth_v:
        in_specs.append(pl.BlockSpec((1, 1, d, 1), IM(lambda bi, hi, qi, ki: (bi, hi // group, 0, 0)), memory_space=pltpu.VMEM))
        args.append(v_mean.astype(jnp.float32)[..., None])
    if has_segments:
        in_specs += [
            pl.BlockSpec((1, 1, block_q), IM(lambda bi, hi, qi, ki: (bi, 0, qi)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, 1), IM(lambda bi, hi, qi, ki: (bi, ki, 0)), memory_space=pltpu.VMEM),
        ]
        args += [
            q_segment_ids.astype(jnp.int32)[:, None, :],
            kv_segment_ids.astype(jnp.int32)[:, :, None],
        ]
    if has_bias:
        bias = bias.astype(jnp.float32) * LOG2E
        if bias.shape[2] == 1:  # per-key vector [B,H,1,Sk] -> column
            bias_t = jnp.swapaxes(bias, 2, 3)
            in_specs.append(pl.BlockSpec((1, 1, block_kv, 1), IM(lambda bi, hi, qi, ki: (bi, hi, ki, 0)), memory_space=pltpu.VMEM))
        else:  # full matrix -> [B,H,Sk,Sq]
            bias_t = jnp.swapaxes(bias, 2, 3)
            in_specs.append(pl.BlockSpec((1, 1, block_kv, block_q), IM(lambda bi, hi, qi, ki: (bi, hi, ki, qi)), memory_space=pltpu.VMEM))
        args.append(bias_t)

    out_specs = [
        pl.BlockSpec((1, 1, d, block_q), IM(lambda bi, hi, qi, ki: (bi, hi, 0, qi)), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, block_q), IM(lambda bi, hi, qi, ki: (bi, hi, 0, qi)), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, d, s_q), out_dtype),
        jax.ShapeDtypeStruct((b, h, 1, s_q), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((8, block_q), jnp.float32),
        pltpu.VMEM((8, block_q), jnp.float32),
        pltpu.VMEM((d, block_q), jnp.float32),
    ]
    if fused_quant_q:
        scratch_shapes += [
            pltpu.VMEM((d, block_q), jnp.int8),
            pltpu.VMEM((8, block_q), jnp.float32),
        ]
    params = dict(
        k_major=True,
        kv_len=s_k,
        block_q=block_q,
        block_kv=block_kv,
        causal=is_causal,
        window=window,
        q_offset=q_off,
        sink=sink,
        quantized_qk=quantized_qk,
        fused_quant_q=fused_quant_q,
        k_pack_bits=k_pack_bits,
        v_quantized=v_quantized,
        pv_int8=pv_int8,
        v_natural=v_natural,
        smooth_v=smooth_v,
        has_segments=has_segments,
        has_bias=has_bias,
        logit_cap=float(logit_cap),
        sm_scale_log2e=float(sm_scale) * LOG2E,
        pv_dtype=pv_dtype,
        mask_v_edge=mask_v_edge,
        softmax_dtype=softmax_dtype,
        ks_uniform=bool(k_scale_uniform),
        mask_split=bool(mask_split),
    )
    flops = 4 * b * h * (nq * block_q) * (nk_blocks * block_kv) * d * (0.5 if is_causal else 1.0)
    if window:
        # Banded grid visits ~window+block_kv keys per q row, not s_k/2.
        flops = int(flops * min(1.0, (window + block_kv) / max(1, s_k) * 2.0))
    cost = pl.CostEstimate(
        flops=int(flops),
        bytes_accessed=int(
            qT.size * qT.dtype.itemsize
            + k.size * k.dtype.itemsize
            + vT.size * vT.dtype.itemsize
        ),
        transcendentals=int(b * h * nq * block_q * nk_blocks * block_kv),
    )
    if tri:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        oT, lse2 = pl.pallas_call(
            functools.partial(_attn_kernel_tri, **params),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(i_tbl, j_tbl, last_tbl, *args)
    else:
        oT, lse2 = pl.pallas_call(
            functools.partial(_attn_kernel_rect, **params),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(*args)

    if return_lse:
        return oT, lse2[:, :, 0, :]
    return oT


def resolve_fp_schedule(head_dim: int) -> str:
    """The fp kernel's measured-best schedule by head_dim (one-process
    A/Bs, r2+r4; see flash_attention_fp). Exported so benchmarks label
    artifacts with the schedule that actually ran."""
    return "q" if head_dim >= 128 else "k"


def flash_attention_fp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    is_causal: bool = False,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    sm_scale: Optional[float] = None,
    schedule: str = "auto",
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Floating-point FlashAttention-2 on the same kernel skeleton — the
    on-chip baseline the low-bit kernels are benchmarked against (role of the
    reference's FA2 baseline, utils/benchmark.py:74-176).

    ``schedule="auto"`` routes by head_dim (one-process A/Bs, r2+r4):
    at d<128 the K-major (transposed-space) kernel wins — full-lane PV +
    sublane softmax (b4 h32 d64 s4096: 85.8 vs 69.5 TF drop-in) — but at
    d>=128 the Q-major kernel's PV already uses full lanes and K-major's
    in/out transposes turn into a 3-5% loss (HD128_FP_AB.json: q 137-143
    TF vs k 133-136 noncausal), so auto picks Q-major there. The int8
    kernels stay K-major at every head_dim (int8 codes ride the
    transpose-free natural-K consumption: 1.08-1.12x over Q-major at
    hd128 in the same process). ``"q"`` also alone supports
    ``static_max``."""
    if schedule == "auto":
        schedule = resolve_fp_schedule(q.shape[-1])
    if schedule == "k":
        out = lowbit_attention_km(
            jnp.swapaxes(q, 2, 3),
            k,
            jnp.swapaxes(v, 2, 3),
            None,
            None,
            is_causal=is_causal,
            window_size=window_size,
            sink_size=sink_size,
            sm_scale=sm_scale,
            block_q=block_q,
            block_kv=block_kv,
            return_lse=return_lse,
            interpret=interpret,
        )
        if return_lse:
            oT, lse2 = out
            return jnp.swapaxes(oT, 2, 3), lse2
        return jnp.swapaxes(out, 2, 3)
    return lowbit_attention(
        q,
        k,
        v,
        None,
        None,
        is_causal=is_causal,
        window_size=window_size,
        sink_size=sink_size,
        sm_scale=sm_scale,
        block_q=block_q if block_q is not None else 1024,
        block_kv=block_kv if block_kv is not None else 1024,
        return_lse=return_lse,
        interpret=interpret,
    )
