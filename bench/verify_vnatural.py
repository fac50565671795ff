"""On-chip A/B: K-major kernel consuming V transposed [D, S] (API default,
pays a whole-tensor V^T relayout in every from-bf16 call) vs ``v_natural``
(contracts the natural [S, D] tile's dim 0 in-kernel — no V^T pass anywhere).

Decides the drop-in default (pending since the v_natural commit). All
timings within ONE process via the transport-safe timer.

Usage: timeout 550 python bench/verify_vnatural.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention_km
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def run_shape(B, H, S, D):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    flops = attention_flops(B, H, D, S, S, causal=False)

    def report(name, t, extra=""):
        print(
            f"[v-nat] {B}x{H}x{S}x{D} {name}: {t*1e3:.2f} ms = "
            f"{tflops(flops, t):.1f} TF {extra}",
            file=sys.stderr,
        )

    # kernel-only on pre-quantized operands (fused-Q route like the API)
    k_c, k_s = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))(k)
    )
    vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))

    kern_T = jax.jit(
        lambda qq, kc, vt, ksc: lowbit_attention_km(qq, kc, vt, None, ksc, fused_quant_q=True)
    )
    kern_N = jax.jit(
        lambda qq, kc, vn, ksc: lowbit_attention_km(
            qq, kc, vn, None, ksc, fused_quant_q=True, v_natural=True
        )
    )
    o_T = jax.block_until_ready(kern_T(q, k_c, vT, k_s))
    o_N = jax.block_until_ready(kern_N(q, k_c, v, k_s))
    d_max = float(jnp.max(jnp.abs(o_T.astype(jnp.float32) - o_N.astype(jnp.float32))))
    t_T = measure_op_time(kern_T, (q, k_c, vT, k_s))
    t_N = measure_op_time(kern_N, (q, k_c, v, k_s))
    report("kernel vT", t_T)
    report("kernel v_natural", t_N, f"delta={d_max:.2e}")

    # from-bf16 e2e: the v_natural variant deletes the V^T relayout pass
    def e2e_T(q, k, v):
        k_c, k_s = q_ops.quant_int8(k, gran="per_token")
        oT = lowbit_attention_km(q, k_c, jnp.swapaxes(v, 2, 3), None, k_s, fused_quant_q=True)
        return jnp.swapaxes(oT, 2, 3)

    def e2e_N(q, k, v):
        k_c, k_s = q_ops.quant_int8(k, gran="per_token")
        oT = lowbit_attention_km(q, k_c, v, None, k_s, fused_quant_q=True, v_natural=True)
        return jnp.swapaxes(oT, 2, 3)

    fT, fN = jax.jit(e2e_T), jax.jit(e2e_N)
    oeT = jax.block_until_ready(fT(q, k, v))
    oeN = jax.block_until_ready(fN(q, k, v))
    cos = float(cosine_similarity(oeN.astype(jnp.float32), oeT.astype(jnp.float32)))
    teT = measure_op_time(fT, (q, k, v))
    teN = measure_op_time(fN, (q, k, v))
    report("e2e vT", teT)
    report("e2e v_natural", teN, f"({teT/teN:.3f}x) cos={cos:.6f}")
    return t_T, t_N, teT, teN


def main():
    run_shape(4, 32, 4096, 64)
    run_shape(1, 30, 17776, 64)


if __name__ == "__main__":
    main()
