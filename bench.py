"""Headline benchmark: INT8 attention speedup over fp16 FlashAttention-2 at
the flagship (CogVideoX) shape, drop-in from bf16 — the reference's own
headline metric class (README.md:23-25: "~1.2x end-to-end over FA2").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_vs_fa2", "vs_baseline": N/1.2}

value = fp16-FA2 wall / int8 wall for the full drop-in attention op
(quantization included) at the CogVideoX-2b attention geometry: 17,776
latent tokens (49x480x720 video), 30 heads, head_dim 64 — the shape the
reference's end-to-end claim is made on. vs_baseline divides by the
reference's published 1.2x. The full-pipeline 50-step DiT run (compile
excluded) is recorded separately in VIDEO_TEST_TPU.json — 1.27x in round 2.

Secondary diagnostics on stderr include the reference bench-suite kernel
metric (int8 kernel TFLOP/s at b4 h32 d64 s4096; reference GPU record
199.5) for cross-round continuity. Timing is remote-transport-safe (see
utils/benchmark.py).
"""

import json
import sys

import jax
import jax.numpy as jnp

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp, lowbit_attention_km
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)

REF_E2E_SPEEDUP = 1.2  # reference README.md:24 (73 s vs 88 s CogVideoX)
REF_INT8_TFLOPS_S4096 = 199.5  # reference GPU kernel record (draw_single.py:16)


def flagship_dropin_speedup():
    """fp16-FA2 vs int8 drop-in (bf16 in, bf16 out, quant included) at the
    CogVideoX attention geometry."""
    B, H, S, D = 1, 30, 17776, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)

    fp_fn = jax.jit(lambda q, k, v: flash_attention_fp(q, k, v))
    int8_fn = jax.jit(lambda q, k, v: lq.lowbit_fa_qk_int8_pv_fp16(q, k, v))
    o_fp = jax.block_until_ready(fp_fn(q, k, v))
    o8 = jax.block_until_ready(int8_fn(q, k, v))
    cos = float(cosine_similarity(o8.astype(jnp.float32), o_fp.astype(jnp.float32)))
    t8 = measure_op_time(int8_fn, (q, k, v))
    t_fp = measure_op_time(fp_fn, (q, k, v))
    return t_fp / t8, t8, t_fp, cos


def kernel_record_s4096():
    """Reference bench-suite kernel metric (pre-quantized operands)."""
    B, H, D, S = 4, 32, 64, 4096
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    qT_codes, q_scale = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))(q)
    )
    k_codes, k_scale = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))(k)
    )
    vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))
    attn_int8 = jax.jit(
        lambda qc, kc, vt, qs, ksc: lowbit_attention_km(qc, kc, vt, qs, ksc)
    )
    jax.block_until_ready(attn_int8(qT_codes, k_codes, vT, q_scale, k_scale))
    t = measure_op_time(attn_int8, (qT_codes, k_codes, vT, q_scale, k_scale))
    return tflops(attention_flops(B, H, D, S, S, causal=False), t), t


def main():
    speedup, t8, t_fp, cos = flagship_dropin_speedup()
    tf_kernel, t_kernel = kernel_record_s4096()
    dev = jax.devices()[0].device_kind
    print(
        f"[bench] flagship drop-in (b1 h30 s17776 d64, quant incl): "
        f"int8 {t8*1e3:.2f} ms vs fp16-FA2 {t_fp*1e3:.2f} ms = {speedup:.3f}x | "
        f"cos_vs_fp={cos:.6f} | ref e2e headline 1.2x | on {dev}",
        file=sys.stderr,
    )
    print(
        f"[bench] kernel record b4 h32 d64 s4096 non-causal: "
        f"int8 {tf_kernel:.1f} TFLOP/s ({t_kernel*1e3:.2f} ms) | "
        f"ref GPU record 199.5 ({tf_kernel/REF_INT8_TFLOPS_S4096:.2f}x)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "int8_dropin_speedup_vs_fa2_cogvideox_shape",
                "value": round(speedup, 3),
                "unit": "x_vs_fa2",
                "vs_baseline": round(speedup / REF_E2E_SPEEDUP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
