"""Long-context attention record: 32K-128K causal prefill (LLM geometry).

The reference's long-sequence claim is "optimized kernels for 8K-128K"
(README.md:19) with benches swept to 32K; this records the single-chip
128K point explicitly (b1 h8 hd128 — a Llama-class prefill shape; KV int8
halves the HBM stream that dominates at this length).

Usage: timeout 1200 python bench/longcontext.py [--output LONGCTX_TPU.json]
"""

from __future__ import annotations

import argparse
import json
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
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head_dim", type=int, default=128)
    p.add_argument("--seq_lens", type=int, nargs="+",
                   default=[32768, 65536, 131072])
    p.add_argument("--output", default=None)
    args = p.parse_args()
    B, H, D = args.batch, args.heads, args.head_dim

    rows = []
    for S in args.seq_lens:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
        fl = attention_flops(B, H, D, S, S, causal=True)
        reps = dict(r1=2, r2=6, samples=2)

        fp_fn = jax.jit(lambda q, k, v: flash_attention_fp(q, k, v, is_causal=True))
        o_fp = jax.block_until_ready(fp_fn(q, k, v))
        t_fp = measure_op_time(fp_fn, (q, k, v), **reps)

        qT, qs = jax.block_until_ready(
            jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))(q)
        )
        kc, ksc = jax.block_until_ready(
            jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))(k)
        )
        vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))
        i8_fn = jax.jit(
            lambda a, b, c, d, e: lowbit_attention_km(a, b, c, d, e, is_causal=True)
        )
        o8 = jax.block_until_ready(i8_fn(qT, kc, vT, qs, ksc))
        cos = float(
            cosine_similarity(
                jnp.swapaxes(o8, 2, 3).astype(jnp.float32), o_fp.astype(jnp.float32)
            )
        )
        t8 = measure_op_time(i8_fn, (qT, kc, vT, qs, ksc), **reps)

        row = {
            "seq": S,
            "fp_tflops": round(tflops(fl, t_fp), 2),
            "fp_ms": round(t_fp * 1e3, 2),
            "int8_tflops": round(tflops(fl, t8), 2),
            "int8_ms": round(t8 * 1e3, 2),
            "speedup": round(t_fp / t8, 3),
            "cos_vs_fp": round(cos, 6),
        }
        rows.append(row)
        print(json.dumps(row))
        # free HBM before the next (bigger) shape
        del q, k, v, qT, kc, vT, o_fp, o8

    if args.output:
        with open(args.output, "w") as f:
            json.dump({"config": vars(args), "causal": True, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
