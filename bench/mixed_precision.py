"""Per-token-block mixed-precision (int8/int4 bitmap) ratio sweep.

Mirrors the reference's mixed-precision benchmark (utils/benchmark.py:638-780
``quantize_with_bitmap`` + example/draw/draw.py int8-ratio sweep 0-100%:
91 -> 168 TFLOP/s non-causal on its GPU). On the GPU the ratio moves SPEED
(int4 tensor-core QK is faster than int8); on TPU the kernel consumes mixed
blocks at int8 rate (in-kernel unpack makes int4 ~ int8 speed), so the
bitmap is an ACCURACY/MEMORY lever: TFLOP/s stays flat across ratios while
cosine-vs-fp climbs with the int8 fraction. This bench records both, same
sweep shape as the reference.

Usage: timeout 550 python bench/mixed_precision.py [--seq 4096]
       [--ratios 0 25 50 75 100] [--output MIXED_TPU.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu import lowbit_fa_mixed_bits
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_heads", type=int, default=32)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--ratios", type=int, nargs="+", default=[0, 25, 50, 75, 100])
    p.add_argument("--causal", action="store_true")
    p.add_argument("--output", default=None)
    args = p.parse_args()
    B, H, D, S = args.batch_size, args.num_heads, args.head_dim, args.seq

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    n_blocks = -(-S // args.block)
    flops = attention_flops(B, H, D, S, S, causal=args.causal)

    o_fp = jax.block_until_ready(
        jax.jit(lambda q, k, v: flash_attention_fp(q, k, v, is_causal=args.causal))(q, k, v)
    )

    # Importance scores: per-block K magnitude (the reference's bitmap comes
    # from an external importance signal; magnitude is the natural default).
    kf = k.astype(jnp.float32)
    blk_mag = jnp.max(
        jnp.abs(kf.reshape(B, H, n_blocks, args.block, D)), axis=(0, 1, 3, 4)
    )
    order = jnp.argsort(-blk_mag)  # most important first -> int8

    rows = []
    fn = jax.jit(
        lambda q, k, v, bm: lowbit_fa_mixed_bits(
            q, k, v, bm, block=args.block, is_causal=args.causal
        )
    )
    for ratio in args.ratios:
        n_int8 = int(round(n_blocks * ratio / 100.0))
        bitmap = jnp.zeros((n_blocks,), jnp.int32).at[order[:n_int8]].set(1)
        o = jax.block_until_ready(fn(q, k, v, bitmap))
        cos = float(cosine_similarity(o.astype(jnp.float32), o_fp.astype(jnp.float32)))
        t = measure_op_time(fn, (q, k, v, bitmap))
        row = {
            "int8_ratio": ratio,
            "tflops": round(tflops(flops, t), 2),
            "ms": round(t * 1e3, 3),
            "cos_vs_fp": round(cos, 6),
        }
        rows.append(row)
        print(json.dumps(row))

    if args.output:
        with open(args.output, "w") as f:
            json.dump(
                {
                    "config": vars(args),
                    "note": "TPU: ratio moves accuracy/memory, not speed "
                            "(int4 unpacks in-kernel at int8 rate)",
                    "rows": rows,
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
