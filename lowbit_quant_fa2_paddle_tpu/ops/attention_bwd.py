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


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, acc,
                   *, block_q, block_kv, causal, scale2):
    i, j = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    run = True if not causal else j * block_kv <= i * block_q + block_q - 1

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]  # [BK, D]
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale2
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0) + i * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_kv
            s2 = jnp.where(col <= row, s2, MASK_VALUE)
        p = jnp.exp2(s2 - lse_ref[0, 0])  # [BQ, BK]; lse col [BQ,1]
        # dO @ V^T on the native bf16 operands (f32 accum via preferred
        # type; upcasting to f32 first measured a wash — Mosaic runs the
        # cast-f32 dot no slower here — but bf16 is the intended rate).
        dov = jax.lax.dot_general(
            do_ref[0, 0], v_ref[0, 0],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        ds = p * (dov - di_ref[0, 0]) * (scale2 / LOG2E)
        acc[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0, 0] = acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref, acc_dk, acc_dv,
                    *, block_q, block_kv, causal, scale2, nq_blocks):
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

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale2
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0) + i * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + j * block_kv
            s2 = jnp.where(col <= row, s2, MASK_VALUE)
        p = jnp.exp2(s2 - lse_ref[0, 0])
        do = do_ref[0, 0]  # bf16; dots accumulate f32 via preferred type
        acc_dv[...] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), do,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dov = jax.lax.dot_general(
            do, v_ref[0, 0],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        ds = p * (dov - di_ref[0, 0]) * (scale2 / LOG2E)
        acc_dk[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(ii == n_inner - 1)
    def _():
        dk_ref[0, 0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_dv[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse2, do, *, is_causal, sm_scale,
               block_q=None, block_kv=None, interpret=None):
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
    if s_k_p != s_k:
        pk = [(0, 0), (0, 0), (0, s_k_p - s_k), (0, 0)]
        k, v = jnp.pad(k, pk), jnp.pad(v, pk)

    lse_col = lse2[..., None]  # [B,H,Sq,1]
    di_col = di[..., None]
    nq, nk = s_q_p // block_q, s_k_p // block_kv

    common_specs = dict(memory_space=pltpu.VMEM)
    qspec = lambda f: pl.BlockSpec((1, 1, block_q, d), f, **common_specs)
    kspec = lambda f: pl.BlockSpec((1, 1, block_kv, d), f, **common_specs)
    qcol = lambda f: pl.BlockSpec((1, 1, block_q, 1), f, **common_specs)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, block_kv=block_kv,
                          causal=is_causal, scale2=scale2),
        grid=(b, h, nq, nk),
        in_specs=[
            qspec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            kspec(lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)),
            kspec(lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)),
            qspec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            qcol(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            qcol(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_specs=qspec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse_col, di_col)

    # Inner dim walks (group head, q block) pairs: ii -> head hk*g + ii//nq,
    # q block ii%nq. Plain q-head index maps fall out at g=1.
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, block_kv=block_kv,
                          causal=is_causal, scale2=scale2, nq_blocks=nq),
        grid=(b, hk, nk, g * nq),
        in_specs=[
            qspec(lambda bi, hi, ki, ii: (bi, hi * g + ii // nq, ii % nq, 0)),
            kspec(lambda bi, hi, ki, ii: (bi, hi, ki, 0)),
            kspec(lambda bi, hi, ki, ii: (bi, hi, ki, 0)),
            qspec(lambda bi, hi, ki, ii: (bi, hi * g + ii // nq, ii % nq, 0)),
            qcol(lambda bi, hi, ki, ii: (bi, hi * g + ii // nq, ii % nq, 0)),
            qcol(lambda bi, hi, ki, ii: (bi, hi * g + ii // nq, ii % nq, 0)),
        ],
        out_specs=[
            kspec(lambda bi, hi, ki, ii: (bi, hi, ki, 0)),
            kspec(lambda bi, hi, ki, ii: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse_col, di_col)
    if s_q_p != s_q:
        dq = dq[:, :, :s_q]
    if s_k_p != s_k:
        dk, dv = dk[:, :, :s_k], dv[:, :, :s_k]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_trainable(q, k, v, is_causal=False, sm_scale=None,
                              block_q=None, block_kv=None):
    """Differentiable Pallas flash attention (bf16/f32). Forward routes
    ``flash_attention_fp``; GQA supported end-to-end (dk/dv accumulate the
    whole q-head group in-kernel — no [B,H,S,D]-sized dk materialization
    followed by a host-side group-sum)."""
    o, _ = _flash_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv)
    return o


def _flash_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv):
    # Forward routes the production K-major schedule with its tuned blocks
    # (on-chip: 3.4 ms vs 7.2 Q-major at b4 h16 s4096 d64 — the trainable
    # path's fwd was 2.1x slow until this). block_q/block_kv only shape the
    # BACKWARD kernels' tiles.
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    o, lse2 = flash_attention_fp(
        q, k, v, is_causal=is_causal, sm_scale=sm_scale, return_lse=True,
    )
    return o.astype(q.dtype), lse2


def _flash_fwd(q, k, v, is_causal, sm_scale, block_q, block_kv):
    o, lse2 = _flash_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv)
    return o, (q, k, v, o, lse2)


def _flash_bwd_rule(is_causal, sm_scale, block_q, block_kv, res, do):
    q, k, v, o, lse2 = res
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    # backward blocks must divide the seq exactly; pick the largest that does.
    # None -> tuned/default blocks resolved inside _flash_bwd.
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse2, do, is_causal=is_causal, sm_scale=sm_scale,
        block_q=block_q, block_kv=block_kv,
    )
    return dq, dk, dv


flash_attention_trainable.defvjp(_flash_fwd, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# Trainable QUANTIZED attention: INT8 forward, fp backward (straight-through)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def lowbit_attention_trainable(q, k, v, is_causal=False, sm_scale=None,
                               block_q=None, block_kv=None):
    """Differentiable INT8-QK attention (quantization-aware training style).

    Forward is the production int8 path (per-token quant + smooth-K through
    ``core.lowbit_fa_qk_int8_pv_fp16``); backward runs the exact fp FA-2
    backward kernels with the straight-through convention: gradients are
    computed from the FULL-PRECISION q/k/v but normalized by the ACTUAL
    quantized forward's (o, lse) residuals — the quantizer itself passes
    gradients through unchanged. Beyond the reference (its only autograd is
    the 4-bit weight matmul, src/triton/utils/quant/qmodule.py:33-112);
    this lets models train against the same kernel they will serve with.

    The kernel's smooth-K shift is softmax-invariant, and the returned LSE
    is already corrected back to unshifted-logit convention
    (core._finish_lse), so the backward sees a consistent softmax.
    """
    o, _ = _lowbit_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv)
    return o


def _lowbit_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv):
    # Local import: core -> ops.attention; this module is imported by tests
    # and models independently of core.
    from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16

    o, lse = lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=is_causal, sm_scale=sm_scale, return_lse=True,
    )
    return o.astype(q.dtype), lse  # lse: natural log, unshifted convention


def _lowbit_fwd(q, k, v, is_causal, sm_scale, block_q, block_kv):
    o, lse = _lowbit_fwd_impl(q, k, v, is_causal, sm_scale, block_q, block_kv)
    return o, (q, k, v, o, lse)


def _lowbit_bwd_rule(is_causal, sm_scale, block_q, block_kv, res, do):
    q, k, v, o, lse = res
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    lse2 = lse.astype(jnp.float32) * LOG2E  # -> base-2 for the bwd kernels
    # None -> tuned/default blocks resolved inside _flash_bwd.
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse2, do, is_causal=is_causal, sm_scale=sm_scale,
        block_q=block_q, block_kv=block_kv,
    )
    return dq, dk, dv


lowbit_attention_trainable.defvjp(_lowbit_fwd, _lowbit_bwd_rule)
