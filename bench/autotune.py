"""Block-size autotuner for the attention kernels.

Sweeps (block_q, block_kv) for a given shape/schedule on the current device
and prints one JSON line per config plus the winner. The reference tunes
per-kernel constants statically (num_warps/stages tables in every Triton
file, e.g. attn_qk_int8_per_block.py:169-238); here the grid is a runtime
sweep because Mosaic compiles any block shape on demand.

Usage:
  python bench/autotune.py --seq 4096 --space k
  python bench/autotune.py --seq 17776 --batch 1 --heads 30 --causal
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
    lowbit_attention,
    lowbit_attention_km,
)
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--space", default="k", choices=["k", "q", "bwd"])
    p.add_argument("--causal", action="store_true")
    p.add_argument("--block_q", type=int, nargs="+",
                   default=[512, 1024, 2048, 4096])
    p.add_argument("--block_kv", type=int, nargs="+",
                   default=[256, 512, 1024])
    p.add_argument("--save", action="store_true",
                   help="persist the winner to the tuning cache "
                        "(utils/tuning.py); the API then uses it whenever "
                        "block_q/block_kv are left unset for this shape")
    args = p.parse_args()

    b, h, s, d = args.batch, args.heads, args.seq, args.head_dim
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    flops = attention_flops(b, h, d, s, s, args.causal)

    if args.space == "bwd":
        # Backward kernels (dq + dkv): sweep over fixed fwd residuals.
        from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
        from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import _flash_bwd

        o, lse2 = jax.jit(
            lambda q, k, v: flash_attention_fp(
                q, k, v, is_causal=args.causal, return_lse=True
            )
        )(q, k, v)
        do = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.bfloat16)
        fargs = (q, k, v, jax.block_until_ready(o), lse2, do)

        def kernel(q, k, v, o, l, g, is_causal, block_q, block_kv):
            return _flash_bwd(q, k, v, o, l, g, is_causal=is_causal,
                              sm_scale=1.0 / d ** 0.5,
                              block_q=block_q, block_kv=block_kv)

        flops = int(flops * 2.5)  # dq/dk/dv: 5 block matmuls vs fwd's 2
    elif args.space == "k":
        qc, qs = q_ops.quant_int8(q, gran="per_token", layout="ds")
        kc, ksc = q_ops.quant_int8(k, gran="per_token")
        fargs = (qc, kc, jnp.swapaxes(v, 2, 3), qs, ksc)
        kernel = lowbit_attention_km
    else:
        qc, qs = q_ops.quant_int8(q, gran="per_token")
        kc, ksc = q_ops.quant_int8(k, gran="per_token")
        fargs = (qc, kc, v, qs, ksc)
        kernel = lowbit_attention

    best = None
    for bq in args.block_q:
        for bkv in args.block_kv:
            if bq > s or bkv > s:
                continue
            fn = jax.jit(
                lambda *xs, _bq=bq, _bkv=bkv: kernel(
                    *xs, is_causal=args.causal,
                    block_q=_bq, block_kv=_bkv,
                )
            )
            try:
                jax.block_until_ready(fn(*fargs))
            except Exception as e:  # Mosaic rejection (VMEM, block rules)
                print(json.dumps({"block_q": bq, "block_kv": bkv,
                                  "error": str(e)[:120]}), flush=True)
                continue
            t = measure_op_time(fn, fargs)
            row = {"block_q": bq, "block_kv": bkv,
                   "tflops": round(tflops(flops, t), 2),
                   "ms": round(t * 1e3, 3)}
            print(json.dumps(row), flush=True)
            if best is None or row["tflops"] > best["tflops"]:
                best = row
    print(json.dumps({"best": best, "space": args.space, "seq": s,
                      "causal": args.causal}), flush=True)
    if args.save and best is not None:
        from lowbit_quant_fa2_paddle_tpu.utils import tuning

        name = {"k": "km", "q": "q", "bwd": "bwd"}[args.space]
        path = tuning.record(
            name, d, s, args.causal,
            best["block_q"], best["block_kv"], best["tflops"],
        )
        print(json.dumps({"saved": path}), flush=True)


if __name__ == "__main__":
    main()
