"""FlashAttention-2 backward pass (Pallas) + differentiable wrapper.

The reference is an inference-only operator library with no backward
anywhere (SURVEY §4/§5) — this EXCEEDS parity so the framework's training
path (models/dit.sgd_train_step) can run flash attention end-to-end instead
of falling back to materialized-logits attention.

Standard FA-2 backward (boom guide §7 / jax.experimental flash_attention):
residuals are (o, lse); ``di = rowsum(dO * O)``; then

  p  = exp2(s2 - lse2)          (s2 = base-2 scaled logits)
  dv = p^T @ dO
  dp = dO @ V^T
  ds = p * (dp - di) * sm_scale (natural-gradient; base-2 factors cancel)
  dq = ds @ K ;  dk = ds^T @ Q

Two kernels with transposed iteration orders: dQ accumulates over KV blocks
per Q block; dKV accumulates over Q blocks per KV block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    LOG2E,
    MASK_VALUE,
    flash_attention_fp,
)
from lowbit_quant_fa2_paddle_tpu.ops.quant import default_interpret
from lowbit_quant_fa2_paddle_tpu.utils import tuning


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, *refs,
                   block_q, block_kv, causal, scale2, quantized=False,
                   window=0):
    if quantized:
        qs_ref, ks_ref, vs_ref, dos_ref, dq_ref, acc = refs
    else:
        dq_ref, acc = refs
    i, j = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    run = True if not causal else j * block_kv <= i * block_q + block_q - 1
    if causal and window > 0:
        # Sliding window: skip blocks entirely below the causal band.
        run = jnp.logical_and(
            run, j * block_kv + block_kv - 1 >= i * block_q - window + 1
        )

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]  # [BK, D]
        if quantized:
            # int8-code backward (VERDICT r2 #4): the QK and dO@V^T dots run
            # on stored codes (contraction-64 int8 measured 196 vs ~120-150
            # bf16 TOPS in-kernel, bench/mxu_probe.py) with rank-1 per-token
            # rescale fused into the existing elementwise chains; all four
            # operand streams DMA as codes (half the bytes).
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs_ref[0, 0] * scale2) * ks_ref[0, 0]
        else:
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale2
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0) + i * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_kv
            keep = col <= row
            if window > 0:
                keep = jnp.logical_and(keep, col + window > row)
            s2 = jnp.where(keep, s2, MASK_VALUE)
        p = jnp.exp2(s2 - lse_ref[0, 0])  # [BQ, BK]; lse col [BQ,1]
        # dO @ V^T on the native bf16 operands (f32 accum via preferred
        # type; upcasting to f32 first measured a wash — Mosaic runs the
        # cast-f32 dot no slower here — but bf16 is the intended rate).
        if quantized:
            dov = jax.lax.dot_general(
                do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * dos_ref[0, 0] * vs_ref[0, 0]
        else:
            dov = jax.lax.dot_general(
                do_ref[0, 0], v_ref[0, 0],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
        ds = p * (dov - di_ref[0, 0]) * (scale2 / LOG2E)
        if quantized:
            # dq = ds @ diag(ks) @ k8: fold the K dequant into ds (fuses into
            # the chain above), cast the code tile bf16 (D-wide, cheap).
            ds = ds * ks_ref[0, 0]
        acc[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0, 0] = acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, *refs,
                    block_q, block_kv, causal, scale2, nq_blocks,
                    quantized=False, window=0):
    if quantized:
        qs_ref, ks_ref, vs_ref, dos_ref, dk_ref, dv_ref, acc_dk, acc_dv = refs
    else:
        dk_ref, dv_ref, acc_dk, acc_dv = refs
    # kv outer; inner dim walks (group q-head, q block) pairs under GQA:
    # dk/dv for one kv head accumulate over ALL q heads in its group.
    j, ii = pl.program_id(2), pl.program_id(3)
    n_inner = pl.num_programs(3)
    i = jax.lax.rem(ii, nq_blocks)  # q block within the current q head

    @pl.when(ii == 0)
    def _():
        acc_dk[...] = jnp.zeros_like(acc_dk)
        acc_dv[...] = jnp.zeros_like(acc_dv)

    run = True if not causal else j * block_kv <= i * block_q + block_q - 1
    if causal and window > 0:
        run = jnp.logical_and(
            run, j * block_kv + block_kv - 1 >= i * block_q - window + 1
        )

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        if quantized:
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs_ref[0, 0] * scale2) * ks_ref[0, 0]
        else:
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale2
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0) + i * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_kv
            keep = col <= row
            if window > 0:
                keep = jnp.logical_and(keep, col + window > row)
            s2 = jnp.where(keep, s2, MASK_VALUE)
        p = jnp.exp2(s2 - lse_ref[0, 0])
        do = do_ref[0, 0]  # bf16 (or int8 codes when quantized)
        if quantized:
            # dv = (p . dos)^T @ do8 * 1 — the dO dequant scale folds into
            # P's q-rows before the transpose-dot.
            pw = p * dos_ref[0, 0]
            acc_dv[...] += jax.lax.dot_general(
                pw.astype(jnp.bfloat16), do.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            dov = jax.lax.dot_general(
                do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * dos_ref[0, 0] * vs_ref[0, 0]
        else:
            acc_dv[...] += jax.lax.dot_general(
                p.astype(jnp.bfloat16), do,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            dov = jax.lax.dot_general(
                do, v_ref[0, 0],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
        ds = p * (dov - di_ref[0, 0]) * (scale2 / LOG2E)
        if quantized:
            # dk = (ds . qs)^T @ q8 — fold the Q dequant into ds's q-rows.
            ds = ds * qs_ref[0, 0]
        acc_dk[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(ii == n_inner - 1)
    def _():
        dk_ref[0, 0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_dv[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse2, do, *, is_causal, sm_scale,
               block_q=None, block_kv=None, interpret=None, quantized=False,
               window=0):
    b, h, s_q, d = q.shape
    hk, s_k = k.shape[1], k.shape[2]
    assert h % hk == 0, (h, hk)
    g = h // hk  # GQA group: dk/dv sum contributions from g q-heads
    if interpret is None:
        interpret = default_interpret()
    if block_q is None or block_kv is None:
        tuned = tuning.lookup("bwd", d, s_q, is_causal)
        tq, tk = tuned if tuned else (1024, 1024)  # measured default, v5e
        block_q = block_q or tq
        block_kv = block_kv or tk
    block_q = min(block_q, 1 << (s_q - 1).bit_length())
    block_kv = min(block_kv, 1 << (s_k - 1).bit_length())
    scale2 = float(sm_scale) * LOG2E

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # [B,H,Sq]

    dq_dtype, dkv_dtype = q.dtype, k.dtype  # grads match primal dtypes
    scales = ()
    if quantized:
        # int8-code backward: all four operand streams become per-token
        # codes (half the DMA) and the contraction-64 dots run s8s8->s32;
        # per-token dequant scales fold rank-1 into the kernels' existing
        # elementwise chains. O(S.D) external quant, amortized over the
        # O(S^2) kernels.
        from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops

        q, qs = quant_ops.quant_int8(q, gran="per_token", interpret=interpret)
        k, ks = quant_ops.quant_int8(k, gran="per_token", interpret=interpret)
        v, vs = quant_ops.quant_int8(v, gran="per_token", interpret=interpret)
        do, dos = quant_ops.quant_int8(do, gran="per_token", interpret=interpret)
        scales = (qs, ks, vs, dos)

    # Non-block-multiple lengths: zero-pad operands and pad LSE with +inf.
    # The math then needs NO in-kernel edge masks: padded q rows see
    # p = exp2(s2 - inf) = 0 (so dk/dv take no contribution and their own
    # dq rows are sliced off), and padded k/v rows are zeros (so dq takes
    # ds @ 0; the garbage dk/dv rows are sliced off). Keeps the kernels
    # mask-free at full tuned block sizes on any length (e.g. the DiT
    # flagship s=17776, which would otherwise degrade to tiny blocks).
    s_q_p = -(-s_q // block_q) * block_q
    s_k_p = -(-s_k // block_kv) * block_kv
    if s_q_p != s_q:
        pq = [(0, 0), (0, 0), (0, s_q_p - s_q), (0, 0)]
        q, do, o = (jnp.pad(x, pq) for x in (q, do, o))
        lse2 = jnp.pad(lse2, pq[:3], constant_values=jnp.inf)
        di = jnp.pad(di, pq[:3])
        if quantized:
            qs, ks, vs, dos = scales
            scales = (jnp.pad(qs, pq[:3]), ks, vs, jnp.pad(dos, pq[:3]))
    if s_k_p != s_k:
        pk = [(0, 0), (0, 0), (0, s_k_p - s_k), (0, 0)]
        k, v = jnp.pad(k, pk), jnp.pad(v, pk)
        if quantized:
            qs, ks, vs, dos = scales
            scales = (qs, jnp.pad(ks, pk[:3]), jnp.pad(vs, pk[:3]), dos)

    lse_col = lse2[..., None]  # [B,H,Sq,1]
    di_col = di[..., None]
    nq, nk = s_q_p // block_q, s_k_p // block_kv

    common_specs = dict(memory_space=pltpu.VMEM)
    qspec = lambda f: pl.BlockSpec((1, 1, block_q, d), f, **common_specs)
    kspec = lambda f: pl.BlockSpec((1, 1, block_kv, d), f, **common_specs)
    qcol = lambda f: pl.BlockSpec((1, 1, block_q, 1), f, **common_specs)
    krow = lambda f: pl.BlockSpec((1, 1, 1, block_kv), f, **common_specs)

    if quantized:
        qs, ks, vs, dos = scales
        qs_col, dos_col = qs[..., None], dos[..., None]  # [B,H,Sq,1]
        ks_row, vs_row = ks[:, :, None, :], vs[:, :, None, :]  # [B,Hk,1,Sk]

    dq_im = lambda bi, hi, qi, ki: (bi, hi, qi, 0)
    if window > 0 and is_causal:
        # Banded DMA: out-of-band grid steps CLAMP their K/V tile index to
        # the band edge — repeated indices make Mosaic skip the DMA (the
        # decode kernel's clamped-walk trick), so the backward streams
        # O(S*W) K/V bytes like the forward's banded grid instead of the
        # rectangular grid's O(S^2). Compute for those steps is already
        # `run`-predicated off.
        def dq_kim(bi, hi, qi, ki):
            j_lo = jnp.maximum((qi * block_q - window + 1) // block_kv, 0)
            j_hi = jnp.minimum(
                (qi * block_q + block_q - 1) // block_kv, nk - 1
            )
            return (bi, hi // g, jnp.clip(ki, j_lo, j_hi), 0)
    else:
        dq_kim = lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)
    dq_in_specs = [
        qspec(dq_im), kspec(dq_kim), kspec(dq_kim), qspec(dq_im),
        qcol(dq_im), qcol(dq_im),
    ]
    dq_args = [q, k, v, do, lse_col, di_col]
    if quantized:
        dq_in_specs += [
            qcol(dq_im),
            krow(lambda bi, hi, qi, ki: (bi, hi // g, 0, ki)),
            krow(lambda bi, hi, qi, ki: (bi, hi // g, 0, ki)),
            qcol(dq_im),
        ]
        dq_args += [qs_col, ks_row, vs_row, dos_col]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, block_kv=block_kv,
                          causal=is_causal, scale2=scale2, quantized=quantized,
                          window=window),
        grid=(b, h, nq, nk),
        in_specs=dq_in_specs,
        out_specs=qspec(dq_im),
        out_shape=jax.ShapeDtypeStruct(q.shape, dq_dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_args)

    # Inner dim walks (group head, q block) pairs: ii -> head hk*g + ii//nq,
    # q block ii%nq. Plain q-head index maps fall out at g=1.
    if window > 0 and is_causal:
        # Banded DMA twin for the dKV grid: clamp the q-tile walk to the
        # kv block's band rows (see the dq note above).
        def kv_qim(bi, hi, ki, ii):
            qi = ii % nq
            i_lo = (ki * block_kv) // block_q
            i_hi = jnp.minimum(
                (ki * block_kv + block_kv - 1 + window - 1) // block_q, nq - 1
            )
            return (bi, hi * g + ii // nq, jnp.clip(qi, i_lo, i_hi), 0)
    else:
        kv_qim = lambda bi, hi, ki, ii: (bi, hi * g + ii // nq, ii % nq, 0)
    kv_kim = lambda bi, hi, ki, ii: (bi, hi, ki, 0)
    kv_in_specs = [
        qspec(kv_qim), kspec(kv_kim), kspec(kv_kim), qspec(kv_qim),
        qcol(kv_qim), qcol(kv_qim),
    ]
    kv_args = [q, k, v, do, lse_col, di_col]
    if quantized:
        kv_in_specs += [
            qcol(kv_qim),
            krow(lambda bi, hi, ki, ii: (bi, hi, 0, ki)),
            krow(lambda bi, hi, ki, ii: (bi, hi, 0, ki)),
            qcol(kv_qim),
        ]
        kv_args += [qs_col, ks_row, vs_row, dos_col]

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, block_kv=block_kv,
                          causal=is_causal, scale2=scale2, nq_blocks=nq,
                          quantized=quantized, window=window),
        grid=(b, hk, nk, g * nq),
        in_specs=kv_in_specs,
        out_specs=[kspec(kv_kim), kspec(kv_kim)],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, dkv_dtype),
            jax.ShapeDtypeStruct(v.shape, dkv_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*kv_args)
    if s_q_p != s_q:
        dq = dq[:, :, :s_q]
    if s_k_p != s_k:
        dk, dv = dk[:, :, :s_k], dv[:, :, :s_k]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention_trainable(q, k, v, is_causal=False, sm_scale=None,
                              block_q=None, block_kv=None, window_size=None):
    """Differentiable Pallas flash attention (bf16/f32). Forward routes
    ``flash_attention_fp``; GQA supported end-to-end (dk/dv accumulate the
    whole q-head group in-kernel — no [B,H,S,D]-sized dk materialization
    followed by a host-side group-sum). ``window_size`` trains sliding-
    window models: the banded forward grid and the band-predicated backward
    see the same (q - W, q] mask."""
    o, _ = _flash_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv,
                           window_size)
    return o


def _flash_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv,
                    window_size=None):
    # Forward routes flash_attention_fp's auto schedule — K-major below
    # d128 (on-chip: 3.4 ms vs 7.2 Q-major at b4 h16 s4096 d64 — the
    # trainable path's fwd was 2.1x slow until this), Q-major at d>=128
    # (r4 routing; see resolve_fp_schedule). block_q/block_kv only shape
    # the BACKWARD kernels' tiles.
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    o, lse2 = flash_attention_fp(
        q, k, v, is_causal=is_causal, window_size=window_size,
        sm_scale=sm_scale, return_lse=True,
    )
    return o.astype(q.dtype), lse2


def _flash_fwd(q, k, v, is_causal, sm_scale, block_q, block_kv, window_size):
    o, lse2 = _flash_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv,
                              window_size)
    return o, (q, k, v, o, lse2)


def _flash_bwd_rule(is_causal, sm_scale, block_q, block_kv, window_size,
                    res, do):
    q, k, v, o, lse2 = res
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # backward blocks must divide the seq exactly; pick the largest that does.
    # None -> tuned/default blocks resolved inside _flash_bwd.
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse2, do, is_causal=is_causal, sm_scale=sm_scale,
        block_q=block_q, block_kv=block_kv,
        window=int(window_size) if window_size else 0,
    )
    return dq, dk, dv


flash_attention_trainable.defvjp(_flash_fwd, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# Trainable QUANTIZED attention: INT8 forward, fp backward (straight-through)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def lowbit_attention_trainable(q, k, v, is_causal=False, sm_scale=None,
                               block_q=None, block_kv=None,
                               bwd_quantized=False, window_size=None):
    """Differentiable INT8-QK attention (quantization-aware training style).

    Forward is the production int8 path (per-token quant + smooth-K through
    ``core.lowbit_fa_qk_int8_pv_fp16``); backward runs the FA-2 backward
    kernels with the straight-through convention: the quantizer itself
    passes gradients through unchanged, normalized by the ACTUAL quantized
    forward's (o, lse) residuals. With ``bwd_quantized`` the backward ALSO
    runs its QK / dO@V^T dots on int8 per-token codes with rank-1 dequant
    folded into the elementwise chains — all four operand streams DMA as
    codes (half the bwd HBM traffic) and the differentiated logits match
    the quantized forward's construction. Measured on v5e (TRAIN_TPU.json
    r3, b4 h16 s4096 d64): fwd+bwd 17.8 ms vs 15.2 fp-bwd — the backward
    is VPU/VMEM-bound like the forward, so the int8 dots only add i32->f32
    conversion passes; hence fp-bwd is the DEFAULT and bwd_quantized is a
    memory-pressure / QAT-consistency option (grad cos 0.9999 vs 0.99999).
    Beyond the reference (its only autograd is the 4-bit weight matmul,
    src/triton/utils/quant/qmodule.py:33-112); this lets models train
    against the same kernel they will serve with.

    The kernel's smooth-K shift is softmax-invariant, and the returned LSE
    is already corrected back to unshifted-logit convention
    (core._finish_lse), so the backward sees a consistent softmax.
    """
    o, _ = _lowbit_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv,
                            window_size)
    return o


def _lowbit_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv,
                     window_size=None):
    # Local import: core -> ops.attention; this module is imported by tests
    # and models independently of core.
    from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16

    o, lse = lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=is_causal, window_size=window_size,
        sm_scale=sm_scale, return_lse=True,
    )
    return o.astype(q.dtype), lse  # lse: natural log, unshifted convention


def _lowbit_fwd(q, k, v, is_causal, sm_scale, block_q, block_kv, bwd_quantized,
                window_size):
    o, lse = _lowbit_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv,
                              window_size)
    return o, (q, k, v, o, lse)


def _lowbit_bwd_rule(is_causal, sm_scale, block_q, block_kv, bwd_quantized,
                     window_size, res, do):
    q, k, v, o, lse = res
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    lse2 = lse.astype(jnp.float32) * LOG2E  # -> base-2 for the bwd kernels
    # None -> tuned/default blocks resolved inside _flash_bwd.
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse2, do, is_causal=is_causal, sm_scale=sm_scale,
        block_q=block_q, block_kv=block_kv, quantized=bwd_quantized,
        window=int(window_size) if window_size else 0,
    )
    return dq, dk, dv


lowbit_attention_trainable.defvjp(_lowbit_fwd, _lowbit_bwd_rule)
