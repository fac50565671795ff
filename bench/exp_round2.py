"""Round-2 K-major kernel levers, measured on-chip at the headline config.

Measured verdicts (b4 h32 d64 s4096, v5e, 2026-08-19):
  * qk_f32_direct (int8 operands, preferred_element_type=f32, would delete
    the int32->f32 convert pass): Mosaic REJECTS i8,i8->f32 tpu.matmul at
    compile time on hardware (interpret mode accepts it) — lever removed.
  * softmax_dtype=bf16 (whole logit chain in bf16): LOSS — 7.71 ms vs the
    6.40 ms f32 baseline; the VPU doesn't run bf16 elementwise at 2x and
    the extra casts dominate. Kept as an opt-in knob on the km wrapper.
  * block sweep around (bq2048, bk512): the default is the optimum
    (bk1024: 7.25, bq1024: 8.39, bk256: 8.42 ms, all bf16sm variants).

Usage: timeout 550 python bench/exp_round2.py [--seq 4096] [--part 0|1]
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
    p.add_argument("--part", type=int, default=-1, help="-1 = all")
    args = p.parse_args()
    B, H, D, S = args.batch, args.heads, args.dim, args.seq

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    flops = attention_flops(B, H, D, S, S, causal=False)

    qT_c, q_s = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))(q)
    )
    k_c, k_s = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))(k)
    )
    vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))

    fp_fn = jax.jit(lambda q, k, v: flash_attention_fp(q, k, v))
    o_fp = jax.block_until_ready(fp_fn(q, k, v))

    def run(name, **kw):
        fn = jax.jit(
            lambda qc, kc, vt, qs, ksc: lowbit_attention_km(qc, kc, vt, qs, ksc, **kw)
        )
        o = jnp.swapaxes(fn(qT_c, k_c, vT, q_s, k_s), 2, 3)
        cos = float(cosine_similarity(o, o_fp))
        t = measure_op_time(fn, (qT_c, k_c, vT, q_s, k_s))
        print(
            f"[exp2] {name}: {t*1e3:.2f} ms = {tflops(flops, t):.1f} TF cos={cos:.6f}",
            file=sys.stderr,
        )
        return t

    if args.part in (-1, 0):
        run("km baseline (bq2048 bk512)")
        run("km +bf16softmax", softmax_dtype=jnp.bfloat16)
    if args.part in (-1, 1):
        for bq, bk in ((1024, 512), (2048, 1024), (1024, 1024), (2048, 256)):
            run(f"km bf16sm bq{bq} bk{bk}", softmax_dtype=jnp.bfloat16, block_q=bq, block_kv=bk)


if __name__ == "__main__":
    main()
