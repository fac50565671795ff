"""One-process A/B of the fp kernel's two schedules at hd128 (VERDICT r3
#3): is the K-major (transposed-space) routing — measured the winner at
hd64 in round 2 — also the right `schedule="auto"` at hd128?

Both variants are jitted side by side and measured interleaved within ONE
process (cross-process numbers drift 20%+ on this transport; see
PERFORMANCE.md). The winner becomes/confirms the fp auto route, and the
hd128 sweep is then re-run so the int8-vs-fp margin is measured against
the best-known fp schedule (the same honesty fix round 2 made at hd64).

Usage: python bench/hd128_fp_ab.py [--causal] [--json HD128_FP_AB.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seq_lens", type=int, nargs="+",
                    default=[1024, 4096, 8192])
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    rows = []
    for s in args.seq_lens:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (args.batch, args.heads, s, args.head_dim)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], shape, jnp.bfloat16)
        flops = attention_flops(args.batch, args.heads, args.head_dim, s, s,
                                args.causal)
        fns = {
            sched: jax.jit(
                lambda q, k, v, _s=sched: flash_attention_fp(
                    q, k, v, is_causal=args.causal, schedule=_s
                )
            )
            for sched in ("k", "q")
        }
        for f in fns.values():
            jax.block_until_ready(f(q, k, v))
        if s <= 2048:
            reps = dict(r1=60, r2=180, samples=8)
        else:
            reps = dict(r1=30, r2=90, samples=6)
        row = {"seq": s, "causal": args.causal}
        for sched, f in fns.items():
            t = measure_op_time(f, (q, k, v), **reps)
            row[f"fp_{sched}_ms"] = round(t * 1e3, 3)
            row[f"fp_{sched}_tflops"] = round(tflops(flops, t), 2)
        row["k_over_q"] = round(row["fp_q_ms"] / row["fp_k_ms"], 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
