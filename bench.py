"""Headline benchmark: INT8-QK Pallas attention TFLOP/s vs the reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFLOP/s", "vs_baseline": N/<ref>}

Convention matches the reference exactly (utils/benchmark.py:212-266):
``flops = 4*B*H*D*S^2`` (halved when causal), rate = flops / mean latency.
Baseline number: the reference's measured INT8 non-causal TFLOP/s at the same
config (b4 h32 hd64 seq4096): 199.5 (example/draw/draw_single.py:16,
BASELINE.md). Timing is remote-transport-safe (see utils/benchmark.py).

Extra diagnostics (fp16 baseline, speedup, accuracy) go to stderr.
"""

import json
import sys

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp, lowbit_attention_km
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)

REF_INT8_TFLOPS_S4096 = 199.5  # reference GPU record at this config

B, H, D, S = 4, 32, 64, 4096


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)

    # Production layout for the K-major kernel: Q^T codes [B,H,D,S] straight
    # from the quant kernel's in-VMEM relayout, K codes in NATURAL layout
    # (K-major needs no K transpose at all), V transposed once.
    quant_t = jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))
    qT_codes, q_scale = jax.block_until_ready(quant_t(q))
    quant = jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))
    k_codes, k_scale = jax.block_until_ready(quant(k))
    vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))

    attn_int8 = jax.jit(
        lambda qc, kc, vt, qs, ksc: lowbit_attention_km(qc, kc, vt, qs, ksc)
    )
    attn_fp = jax.jit(lambda q, k, v: flash_attention_fp(q, k, v))

    flops = attention_flops(B, H, D, S, S, causal=False)
    t_int8 = measure_op_time(attn_int8, (qT_codes, k_codes, vT, q_scale, k_scale))
    tflops_int8 = tflops(flops, t_int8)
    t_fp = measure_op_time(attn_fp, (q, k, v))
    tflops_fp = tflops(flops, t_fp)

    # Accuracy vs the fp kernel (the exact oracle would materialize an
    # [B,H,S,S] logits tensor — 8.6 GB at this config).
    o = jnp.swapaxes(attn_int8(qT_codes, k_codes, vT, q_scale, k_scale), 2, 3)
    cos = float(cosine_similarity(o, attn_fp(q, k, v)))

    print(
        f"[bench] int8={tflops_int8:.1f} TFLOP/s ({t_int8*1e3:.2f} ms) | "
        f"fp16-FA2={tflops_fp:.1f} TFLOP/s ({t_fp*1e3:.2f} ms) | "
        f"speedup={tflops_int8/tflops_fp:.2f}x | cos_vs_fp={cos:.6f} | "
        f"config b{B} h{H} d{D} s{S} non-causal on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "int8_attn_tflops_b4h32d64s4096",
                "value": round(tflops_int8, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops_int8 / REF_INT8_TFLOPS_S4096, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
