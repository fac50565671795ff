"""EXPERIMENT: attention block computed in transposed (K-major) space.

Hypothesis (PERFORMANCE.md "why int8 ~ fp"): the hd64 kernel is bound by the
serial VPU softmax chain + the PV dot whose N=64 output uses half the MXU
lanes. Computing the whole block transposed fixes both ends:

  s^T = K[BK,D] @ Q^T[D,BQ]      (K natural layout, Q^T from quant layout="ds")
  m,l = reduce over axis 0        (sublane direction - elementwise vreg ops,
                                   not cross-lane shuffles)
  o^T += V^T[D,BK] @ P^T[BK,BQ]  (N = BQ = 1024: FULL output lanes vs 64)

Output is O^T [B,H,D,S]; consumers fold the transpose into the next matmul's
dimension numbers (free on MXU), or pay one XLA transpose for drop-in layout.

Usage: timeout 550 python bench/exp_transposed.py
"""

import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp, lowbit_attention
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import attention_flops, measure_op_time, tflops

LOG2E = math.log2(math.e)
NEG_INIT = -1e30
STATS_SUB = 8  # sublane height of the m/l scratch rows


def _tattn_kernel(qT_ref, k_ref, vT_ref, qs_ref, ks_ref, oT_ref, m_scr, l_scr, acc_scr,
                  *, kv_len, block_q, block_kv, causal):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if causal:
        should_run = j * block_kv <= i * block_q + block_q - 1
    else:
        should_run = True

    @pl.when(should_run)
    def _compute():
        qT = qT_ref[0, 0]   # [D, BQ] int8
        k = k_ref[0, 0]     # [BK, D] int8 (natural layout!)
        # s^T [BK, BQ]
        sT = jax.lax.dot_general(
            k, qT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        sT = sT * ks_ref[0, 0] * qs_ref[0, 0]  # [BK,1] column * [1,BQ] row

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
            sT = jnp.where(mask, sT, -0.7 * 3.4e38)

        m_prev = m_scr[...]                       # [8, BQ] replicated rows
        l_prev = l_scr[...]
        m_curr = jnp.max(sT, axis=0, keepdims=True)  # sublane reduce -> [1, BQ]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)            # [8, BQ]
        pT = jnp.exp2((sT - m_next[:1]).astype(jnp.bfloat16))  # [BK, BQ]
        l_curr = jnp.sum(pT, axis=0, keepdims=True, dtype=jnp.float32)
        l_scr[...] = alpha * l_prev + l_curr
        m_scr[...] = m_next

        vT = vT_ref[0, 0]  # [D, BK] bf16
        # o^T accumulate: [D, BK] @ [BK, BQ] -> [D, BQ], N=BQ full lanes.
        pv = jax.lax.dot_general(
            vT, pT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:1] + pv

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[...][:1]  # [1, BQ]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        oT_ref[0, 0] = (acc_scr[...] / l_safe).astype(oT_ref.dtype)


def tattn(qT, k, vT, q_scale, k_scale, *, is_causal=False, sm_scale=None,
          block_q=1024, block_kv=1024, interpret=None):
    """q/k int8 codes; qT [B,H,D,S], k [B,Hk,S,D], vT [B,Hk,D,S].
    Returns O^T [B,H,D,S] bf16."""
    b, h, d, s_q = qT.shape
    _, h_kv, s_k, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = q_ops.default_interpret()
    group = h // h_kv
    q_scale = (q_scale * (sm_scale * LOG2E)).astype(jnp.float32)
    k_scale = k_scale.astype(jnp.float32)
    nq, nk = q_ops.cdiv(s_q, block_q), q_ops.cdiv(s_k, block_kv)
    grid = (b, h, nq, nk)

    in_specs = [
        pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, qi, ki: (bi, hi // group, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d, block_kv), lambda bi, hi, qi, ki: (bi, hi // group, 0, ki), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_kv, 1), lambda bi, hi, qi, ki: (bi, hi // group, ki, 0), memory_space=pltpu.VMEM),
    ]
    args = [qT, k, vT, q_scale[:, :, None, :], k_scale[..., None]]
    out_specs = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, qi, ki: (bi, hi, 0, qi), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, d, s_q), jnp.bfloat16)
    scratch = [
        pltpu.VMEM((STATS_SUB, block_q), jnp.float32),
        pltpu.VMEM((STATS_SUB, block_q), jnp.float32),
        pltpu.VMEM((d, block_q), jnp.float32),
    ]
    flops = 4 * b * h * (nq * block_q) * (nk * block_kv) * d * (0.5 if is_causal else 1.0)
    cost = pl.CostEstimate(flops=int(flops),
                           bytes_accessed=int(qT.size + k.size + vT.size * 2),
                           transcendentals=int(b * h * nq * block_q * nk * block_kv))
    return pl.pallas_call(
        functools.partial(_tattn_kernel, kv_len=s_k, block_q=block_q,
                          block_kv=block_kv, causal=is_causal),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


def main():
    B, H, D, S = 4, 32, 64, 4096
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)

    quant_t = jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))
    quant = jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))
    qT_codes, q_scale = jax.block_until_ready(quant_t(q))
    k_codes, k_scale = jax.block_until_ready(quant(k))
    kT_codes, _ = jax.block_until_ready(quant_t(k))
    vT = jnp.swapaxes(v, 2, 3)

    f_t = jax.jit(lambda a, b_, c, d_, e: tattn(a, b_, c, d_, e))
    f_base = jax.jit(lambda qc, kc, v_, qs, ksc: lowbit_attention(
        qc, kc, v_, qs, ksc, k_transposed=True))
    f_fp = jax.jit(lambda a, b_, c: flash_attention_fp(a, b_, c))

    q_codes = jnp.swapaxes(qT_codes, 2, 3)  # [B,H,S,D] for the baseline

    oT = f_t(qT_codes, k_codes, vT, q_scale, k_scale)
    o_base = f_base(q_codes, kT_codes, v, q_scale, k_scale)
    o_fp = f_fp(q, k, v)
    o_t = jnp.swapaxes(oT, 2, 3)
    print("cos tattn vs base:", float(cosine_similarity(o_t, o_base)))
    print("cos tattn vs fp:  ", float(cosine_similarity(o_t, o_fp)))

    flops = attention_flops(B, H, D, S, S, causal=False)
    t1 = measure_op_time(f_t, (qT_codes, k_codes, vT, q_scale, k_scale))
    t2 = measure_op_time(f_base, (q_codes, kT_codes, v, q_scale, k_scale))
    t3 = measure_op_time(f_fp, (q, k, v))
    print(f"tattn (K-major): {tflops(flops, t1):.1f} TF ({t1*1e3:.2f} ms)")
    print(f"base  (Q-major): {tflops(flops, t2):.1f} TF ({t2*1e3:.2f} ms)")
    print(f"fp    (Q-major): {tflops(flops, t3):.1f} TF ({t3*1e3:.2f} ms)")

    # causal at the best config (rect grid with predication here; the real
    # integration uses the triangular scalar-prefetch grid)
    fc = jax.jit(lambda a, b_, c, d_, e: tattn(
        a, b_, c, d_, e, is_causal=True, block_q=2048, block_kv=512))
    fc_base = jax.jit(lambda qc, kc, v_, qs, ksc: lowbit_attention(
        qc, kc, v_, qs, ksc, k_transposed=True, is_causal=True))
    oc = jnp.swapaxes(fc(qT_codes, k_codes, vT, q_scale, k_scale), 2, 3)
    oc_b = fc_base(q_codes, kT_codes, v, q_scale, k_scale)
    print("causal cos vs base:", float(cosine_similarity(oc, oc_b)))
    cflops = attention_flops(B, H, D, S, S, causal=True)
    tc = measure_op_time(fc, (qT_codes, k_codes, vT, q_scale, k_scale))
    tcb = measure_op_time(fc_base, (q_codes, kT_codes, v, q_scale, k_scale))
    print(f"tattn causal-rect: {tflops(cflops, tc):.1f} TF ({tc*1e3:.2f} ms)")
    print(f"base  causal-tri:  {tflops(cflops, tcb):.1f} TF ({tcb*1e3:.2f} ms)")

    for bq, bk in [(2048, 256), (1536, 512), (2048, 768)]:
        try:
            f = jax.jit(lambda a, b_, c, d_, e, bq=bq, bk=bk: tattn(
                a, b_, c, d_, e, block_q=bq, block_kv=bk))
            jax.block_until_ready(f(qT_codes, k_codes, vT, q_scale, k_scale))
            t = measure_op_time(f, (qT_codes, k_codes, vT, q_scale, k_scale))
            print(f"tattn bq={bq} bk={bk}: {tflops(flops, t):.1f} TF ({t*1e3:.2f} ms)")
        except Exception as ex:
            print(f"tattn bq={bq} bk={bk}: FAIL {type(ex).__name__}: {str(ex)[:100]}")


if __name__ == "__main__":
    main()
