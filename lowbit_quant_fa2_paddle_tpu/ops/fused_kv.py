"""Fully-fused attention over packed low-bit KV with zero-points
(KIVI-style) — both K and V stay packed in HBM and are unpacked + dequantized
inside the kernel.

TPU re-design of the reference's fused 4-bit attention family
(src/triton/quantization/attn_4bit_per_block.py:28-421 — in-kernel
``(code >> idx*bits) & mask; fma(t, scale, mn)`` before each dot — and the
standalone v1/v2 4bit_flash_attn_triton.py). Differences, by design:

* Pack axis is head_dim (the halves/quarters-of-D scheme of ops/quant.py —
  a lane concat instead of Triton's ``tl.where`` interleave stitching), while
  the quantization *group* axis is the sequence: one (scale, mn) row of
  shape [D] per ``group`` tokens per channel — KIVI's per-channel K
  grouping. With ``group == block_kv`` the kernel sees one [1, D] scale/mn
  row per tile: dequant is a single fused multiply-add over the [BK, D]
  tile, far cheaper than per-element zero-point handling in the [BQ, BK]
  logits domain.
* Zero-points are handled **exactly** — contrast the reference's
  ``forward_merging``, which drops them as an approximation
  (attn_qk_int4_per_block.py:54, SURVEY §quirks).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    LOG2E,
    MASK_VALUE,
    NEG_INIT,
    STATS_WIDTH,
)
from lowbit_quant_fa2_paddle_tpu.ops.quant import cdiv, default_interpret
from lowbit_quant_fa2_paddle_tpu.ops.reference import round_away


# ---------------------------------------------------------------------------
# Group quantization along seq (per-channel scale/mn per token group)
# ---------------------------------------------------------------------------


def quant_kv_grouped(
    x: jax.Array, *, bits: int = 4, group: int = 256
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric per-channel group quantization of ``[B, H, S, D]`` along
    seq: one (scale, mn) per (B, H, S/group, D). Codes are packed along D
    with the halves/quarters scheme (bits 4 or 2).

    Returns ``(packed int8 [B,H,S,D*bits//8], scale [B,H,S/group,D],
    mn [B,H,S/group,D])``.
    """
    assert bits in (4, 2)
    b, h, s, d = x.shape
    s_pad = cdiv(s, group) * group
    xf = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    xg = xf.reshape(b, h, s_pad // group, group, d)
    mn = jnp.min(xg, axis=3)
    mx = jnp.max(xg, axis=3)
    qmax = 2**bits - 1
    scale = (mx - mn) / qmax
    scale = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(
        round_away((xg - mn[:, :, :, None]) / scale[:, :, :, None]), 0, qmax
    ).astype(jnp.int32)
    codes = codes.reshape(b, h, s_pad, d)[:, :, :s]
    if bits == 4:
        lo = codes[..., : d // 2] & 0xF
        hi = codes[..., d // 2 :] & 0xF
        packed = (lo | (hi << 4)).astype(jnp.int8)
    else:
        q = d // 4
        b0 = codes[..., :q] & 0x3
        b1 = codes[..., q : 2 * q] & 0x3
        b2 = codes[..., 2 * q : 3 * q] & 0x3
        b3 = codes[..., 3 * q :] & 0x3
        packed = (b0 | (b1 << 2) | (b2 << 4) | (b3 << 6)).astype(jnp.int8)
    return packed, scale, mn


def _unpack_unsigned(packed: jax.Array, bits: int) -> jax.Array:
    """Packed codes -> unsigned int32 codes in [0, 2^bits)."""
    p32 = packed.astype(jnp.int32)
    if bits == 4:
        lo = p32 & 0xF
        hi = (p32 >> 4) & 0xF
        return jnp.concatenate([lo, hi], axis=-1)
    parts = [(p32 >> (2 * i)) & 0x3 for i in range(4)]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _fused_kv_kernel(
    q_ref,
    k_ref,
    ks_ref,
    km_ref,
    v_ref,
    vs_ref,
    vm_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    kv_len: int,
    block_q: int,
    block_kv: int,
    causal: bool,
    bits: int,
    sm_scale_log2e: float,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = True
    if causal:
        should_run = j * block_kv <= i * block_q + block_q - 1

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
        kc = _unpack_unsigned(k_ref[0, 0], bits).astype(jnp.float32)  # [BK, D]
        k = kc * ks_ref[0, 0, 0] + km_ref[0, 0, 0]  # fma with [1, D] rows
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale_log2e

        mask = None
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0) + i * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + j * block_kv
            mask = col <= row
        if kv_len % block_kv != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1) + j * block_kv
            inb = col < kv_len
            mask = inb if mask is None else jnp.logical_and(mask, inb)
        if mask is not None:
            s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[...] = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next

        vc = _unpack_unsigned(v_ref[0, 0], bits).astype(jnp.float32)
        v = vc * vs_ref[0, 0, 0] + vm_ref[0, 0, 0]
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[...][:, :1]
        o_ref[0, 0] = (acc_scr[...] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def _fused_kv_kernel_km(
    q_ref,
    k_ref,
    ks_ref,
    km_ref,
    v_ref,
    vs_ref,
    vm_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    kv_len: int,
    block_q: int,
    block_kv: int,
    causal: bool,
    bits: int,
    sm_scale_log2e: float,
):
    """K-major twin of ``_fused_kv_kernel`` (see ops/attention._attn_body_km
    for the schedule rationale): Q^T [D, BQ] float, K packed NATURAL (unpack
    along lanes), V packed TRANSPOSED [Dp, BK] (unpack along sublanes), scale
    /mn columns, sublane softmax reductions, full-lane PV, O^T out."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = True
    if causal:
        should_run = j * block_kv <= i * block_q + block_q - 1

    @pl.when(should_run)
    def _compute():
        qT = q_ref[0, 0].astype(jnp.float32)  # [D, BQ]
        kc = _unpack_unsigned(k_ref[0, 0], bits).astype(jnp.float32)  # [BK, D]
        k = kc * ks_ref[0, 0, 0] + km_ref[0, 0, 0]  # fma with [1, D] rows
        sT = jax.lax.dot_general(
            k, qT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        sT = sT * sm_scale_log2e

        mask = None
        if causal:
            kvrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0) + j * block_kv
            qcol = jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1) + i * block_q
            mask = kvrow <= qcol
        if kv_len % block_kv != 0:
            kvrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0) + j * block_kv
            inb = kvrow < kv_len
            mask = inb if mask is None else jnp.logical_and(mask, inb)
        if mask is not None:
            sT = jnp.where(mask, sT, MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(sT, axis=0, keepdims=True)  # sublane reduce [1, BQ]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        pT = jnp.exp2((sT - m_next[:1]).astype(jnp.bfloat16))
        l_scr[...] = alpha * l_prev + jnp.sum(pT, axis=0, keepdims=True, dtype=jnp.float32)
        m_scr[...] = m_next

        # V packed [Dp, BK]: unpack along the SUBLANE axis (axis 0) — the
        # transposed-space mirror of the lane unpack.
        p32 = v_ref[0, 0].astype(jnp.int32)
        if bits == 4:
            vc = jnp.concatenate([p32 & 0xF, (p32 >> 4) & 0xF], axis=0)
        else:
            vc = jnp.concatenate([(p32 >> (2 * n)) & 0x3 for n in range(4)], axis=0)
        vT = vc.astype(jnp.float32) * vs_ref[0, 0, 0] + vm_ref[0, 0, 0]  # [D,BK]*[D,1]
        pv = jax.lax.dot_general(
            vT.astype(jnp.bfloat16), pT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:1] + pv

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[...][:1]
        o_ref[0, 0] = (acc_scr[...] / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def fused_packed_kv_attention(
    q: jax.Array,
    k_packed: jax.Array,
    v_packed: jax.Array,
    k_scale: jax.Array,
    k_mn: jax.Array,
    v_scale: jax.Array,
    v_mn: jax.Array,
    *,
    bits: int = 4,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: int = 512,
    group: int = 256,
    kernel_space: str = "q",
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention with K and V resident as packed ``bits``-bit codes.

    q: ``[B, H, Sq, D]`` float; packed tensors from :func:`quant_kv_grouped`
    with the same ``group`` (= kernel kv block size). HND, GQA supported.
    ``kernel_space="k"`` runs the K-major schedule (sublane softmax,
    full-lane PV; V codes transposed once at entry — pre-transpose the
    packed cache at build time to avoid the pass entirely).
    """
    b, h, s_q, d = q.shape
    _, h_kv, s_k, _ = k_packed.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = default_interpret()
    assert h % h_kv == 0, f"GQA requires num_q_heads ({h}) divisible by num_kv_heads ({h_kv})"
    g = h // h_kv
    block_kv = group
    n_groups = k_scale.shape[2]
    assert n_groups * group >= s_k, (n_groups, group, s_k)

    block_q = min(block_q, max(128, s_q))
    sq_pad = cdiv(s_q, block_q) * block_q
    sk_pad = n_groups * group
    if sq_pad != s_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - s_q), (0, 0)))
    if k_packed.shape[2] != sk_pad:
        pad = sk_pad - k_packed.shape[2]
        k_packed = jnp.pad(k_packed, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_packed = jnp.pad(v_packed, ((0, 0), (0, 0), (0, pad), (0, 0)))

    grid = (b, h, sq_pad // block_q, sk_pad // block_kv)
    dp = k_packed.shape[-1]
    k_major = kernel_space == "k"

    kernel = functools.partial(
        _fused_kv_kernel_km if k_major else _fused_kv_kernel,
        kv_len=s_k,
        block_q=block_q,
        block_kv=block_kv,
        causal=is_causal,
        bits=bits,
        sm_scale_log2e=float(sm_scale) * LOG2E,
    )
    # Scale/mn rows travel as [B, Hk, nG, 1, D] so the block's trailing dims
    # (1, D) are Mosaic-legal (second-to-last equals the array dim).
    scale_spec = pl.BlockSpec(
        (1, 1, 1, 1, d), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0, 0), memory_space=pltpu.VMEM
    )
    # V scale/mn as COLUMNS [B, Hk, nG, D, 1] in the K-major schedule.
    vcol_spec = pl.BlockSpec(
        (1, 1, 1, d, 1), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0, 0), memory_space=pltpu.VMEM
    )
    k_spec = pl.BlockSpec((1, 1, block_kv, dp), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0), memory_space=pltpu.VMEM)
    if k_major:
        q_in = jnp.swapaxes(q, 2, 3)
        v_in = jnp.swapaxes(v_packed, 2, 3)  # [B,Hk,Dp,S]; pre-transpose the
        # packed cache at build time to skip this pass in serving.
        q_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((1, 1, dp, block_kv), lambda bi, hi, qi, ki: (bi, hi // g, 0, ki), memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, d, sq_pad), out_dtype)
        scratch_shapes = [
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ]
        vs_in = jnp.swapaxes(v_scale.astype(jnp.float32)[:, :, :, None, :], 3, 4)
        vm_in = jnp.swapaxes(v_mn.astype(jnp.float32)[:, :, :, None, :], 3, 4)
        vs_spec = vm_spec = vcol_spec
    else:
        q_in, v_in = q, v_packed
        q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM)
        v_spec = k_spec
        out_specs = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, sq_pad, d), out_dtype)
        scratch_shapes = [
            pltpu.VMEM((block_q, STATS_WIDTH), jnp.float32),
            pltpu.VMEM((block_q, STATS_WIDTH), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
        vs_in = v_scale.astype(jnp.float32)[:, :, :, None, :]
        vm_in = v_mn.astype(jnp.float32)[:, :, :, None, :]
        vs_spec = vm_spec = scale_spec
    o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, k_spec, scale_spec, scale_spec, v_spec, vs_spec, vm_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        q_in,
        k_packed,
        k_scale.astype(jnp.float32)[:, :, :, None, :],
        k_mn.astype(jnp.float32)[:, :, :, None, :],
        v_in,
        vs_in,
        vm_in,
    )
    if k_major:
        return jnp.swapaxes(o, 2, 3)[:, :, :s_q]
    return o[:, :, :s_q]
