"""On-chip verification of the two pending K-major items (PERFORMANCE.md):

1. fused-Q variant (``fused_quant_q``): hoisted in-kernel per-token Q quant +
   VMEM relayout — deletes the external Q quant kernel AND the Q^T pass.
   Bit-identical on CPU; here we measure the end-to-end from-bf16 cost
   against the external-quant production path.
2. pv_int8 economics: true int8 P@V in the K-major schedule (N = BQ full
   lanes). On the Q-major kernel the [BQ,BK] requant pass cost more than the
   int8 MXU rate saved; the K-major PV shape is different, so measure.

All timings in ONE process via the transport-safe timer (cross-process
numbers drift 2-4x — verify SKILL notes).

Usage: timeout 550 python bench/verify_km_pending.py [--seq 4096]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    flash_attention_fp,
    lowbit_attention_km,
)
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--seq", type=int, default=4096)
    args = p.parse_args()
    B, H, D, S = args.batch, args.heads, args.dim, args.seq

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    flops = attention_flops(B, H, D, S, S, causal=False)

    def report(name, t, extra=""):
        print(
            f"[km-verify] {name}: {t*1e3:.2f} ms = {tflops(flops, t):.1f} TF {extra}",
            file=sys.stderr,
        )

    # --- reference outputs for accuracy ---
    fp_fn = jax.jit(lambda q, k, v: flash_attention_fp(q, k, v))
    o_fp = jax.block_until_ready(fp_fn(q, k, v))

    # --- 1) production external-quant path, end-to-end from bf16 ---
    def ext_path(q, k, v):
        qT_c, q_s = q_ops.quant_int8(q, gran="per_token", layout="ds")
        k_c, k_s = q_ops.quant_int8(k, gran="per_token")
        vT = jnp.swapaxes(v, 2, 3)
        oT = lowbit_attention_km(qT_c, k_c, vT, q_s, k_s)
        return jnp.swapaxes(oT, 2, 3)

    ext_fn = jax.jit(ext_path)
    o_ext = jax.block_until_ready(ext_fn(q, k, v))
    t_ext = measure_op_time(ext_fn, (q, k, v))
    report("external-quant e2e", t_ext, f"cos={float(cosine_similarity(o_ext, o_fp)):.6f}")

    # --- 2) fused-Q path, end-to-end from bf16 (K still external) ---
    def fusedq_path(q, k, v):
        k_c, k_s = q_ops.quant_int8(k, gran="per_token")
        vT = jnp.swapaxes(v, 2, 3)
        oT = lowbit_attention_km(q, k_c, vT, None, k_s, fused_quant_q=True)
        return jnp.swapaxes(oT, 2, 3)

    fq_fn = jax.jit(fusedq_path)
    o_fq = jax.block_until_ready(fq_fn(q, k, v))
    t_fq = measure_op_time(fq_fn, (q, k, v))
    report(
        "fused-Q e2e", t_fq,
        f"cos={float(cosine_similarity(o_fq, o_fp)):.6f} "
        f"delta_vs_ext={float(jnp.max(jnp.abs(o_fq.astype(jnp.float32) - o_ext.astype(jnp.float32)))):.2e}",
    )

    # --- fp drop-in for context ---
    t_fp = measure_op_time(fp_fn, (q, k, v))
    report("fp16-FA2", t_fp)

    # --- 3) pv_int8 economics on pre-quantized operands ---
    quant_t = jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))
    qT_c, q_s = jax.block_until_ready(quant_t(q))
    quant_n = jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))
    k_c, k_s = jax.block_until_ready(quant_n(k))
    vq_fn = jax.jit(lambda x: q_ops.quant_v_int8_per_channel(x))
    v_c, v_s, _ = jax.block_until_ready(vq_fn(v))
    vT_c = jax.block_until_ready(jnp.swapaxes(v_c, 2, 3))
    vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))

    km_bf = jax.jit(lambda qc, kc, vt, qs, ksc: lowbit_attention_km(qc, kc, vt, qs, ksc))
    t_bf = measure_op_time(km_bf, (qT_c, k_c, vT, q_s, k_s))
    report("kernel int8 / bf16-V / bf16-PV", t_bf)

    km_v8 = jax.jit(
        lambda qc, kc, vt, qs, ksc, vs: lowbit_attention_km(qc, kc, vt, qs, ksc, v_scale=vs)
    )
    o_v8 = km_v8(qT_c, k_c, vT_c, q_s, k_s, v_s)
    cos_v8 = float(cosine_similarity(jnp.swapaxes(o_v8, 2, 3), o_fp))
    t_v8 = measure_op_time(km_v8, (qT_c, k_c, vT_c, q_s, k_s, v_s))
    report("kernel int8 / int8-V / bf16-PV", t_v8, f"cos={cos_v8:.6f}")

    km_pv8 = jax.jit(
        lambda qc, kc, vt, qs, ksc, vs: lowbit_attention_km(
            qc, kc, vt, qs, ksc, v_scale=vs, pv_int8=True
        )
    )
    o_pv8 = km_pv8(qT_c, k_c, vT_c, q_s, k_s, v_s)
    cos_pv8 = float(cosine_similarity(jnp.swapaxes(o_pv8, 2, 3), o_fp))
    t_pv8 = measure_op_time(km_pv8, (qT_c, k_c, vT_c, q_s, k_s, v_s))
    report("kernel int8 / int8-V / INT8-PV", t_pv8, f"cos={cos_pv8:.6f}")

    print(
        f"[km-verify] summary s{S}: ext {t_ext*1e3:.2f} | fusedQ {t_fq*1e3:.2f} | "
        f"fp {t_fp*1e3:.2f} ms; kernel bf16PV {t_bf*1e3:.2f} | int8V {t_v8*1e3:.2f} | "
        f"pv_int8 {t_pv8*1e3:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
