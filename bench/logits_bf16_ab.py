"""A/B: bf16 logits tile with f32 m/l compensation (VERDICT r4 #8 — the
one VPU-chain lever class not yet closed end-to-end).

Code-reading note that bounds expectations: with ``softmax_dtype=bf16``
the K-major kernel ALREADY keeps the m/l state f32 (m_curr casts to f32 at
ops/attention.py:414; m_scr/l_scr/alpha are f32 scratch) — so the "mixed
split" (bf16 [BK,BQ] tiles, f32 row-state) IS the existing knob; the r1
"full-bf16 chain" loss (7.71 vs 6.40 ms, exp_round2) already measured it
at the headline causal config. This driver re-measures it interleaved at
s4096 (causal + non-causal — the masked chain is where narrower tiles
could win) and s32768 non-causal, min-of-3 rounds per variant, ONE
process.

Usage: timeout 550 python bench/logits_bf16_ab.py [--json LOGITS_BF16_AB.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention_km
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def build(S, causal):
    B, H, D = 4, 32, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    qT_codes, q_scale = jax.jit(
        lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))(q)
    k_codes, k_scale = jax.jit(
        lambda x: q_ops.quant_int8(x, gran="per_token"))(k)
    vT = jnp.swapaxes(v, 2, 3)
    args = (qT_codes, k_codes, vT, q_scale, k_scale)

    def make(sm_dt):
        return jax.jit(lambda qc, kc, vt, qs, ksc: lowbit_attention_km(
            qc, kc, vt, qs, ksc, is_causal=causal, softmax_dtype=sm_dt))

    flops = attention_flops(B, H, D, S, S, causal=causal)
    return args, make, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="LOGITS_BF16_AB.json")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    cases = [(4096, True), (4096, False), (32768, False)]
    rows = []
    for S, causal in cases:
        fargs, make, flops = build(S, causal)
        variants = {"f32": make(None), "bf16_logits": make(jnp.bfloat16)}
        for fn in variants.values():
            jax.block_until_ready(fn(*fargs))  # compile outside the clock
        reps = (dict(r1=30, r2=90, samples=6) if S <= 8192
                else dict(r1=2, r2=6, samples=2))
        best = {k: float("inf") for k in variants}
        for r in range(args.rounds):  # interleave; sub-10ms rows flap
            for name, fn in variants.items():
                t = measure_op_time(fn, fargs, **reps)
                best[name] = min(best[name], t)
                print(f"[ab] s{S} causal={causal} {name} round {r}: "
                      f"{t*1e3:.3f} ms", file=sys.stderr, flush=True)
        row = {
            "seq": S, "causal": causal,
            "f32_ms": round(best["f32"] * 1e3, 3),
            "bf16_ms": round(best["bf16_logits"] * 1e3, 3),
            "f32_tflops": round(tflops(flops, best["f32"]), 1),
            "bf16_tflops": round(tflops(flops, best["bf16_logits"]), 1),
            "bf16_speedup": round(best["f32"] / best["bf16_logits"], 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {
        "device": jax.devices()[0].device_kind,
        "note": "softmax_dtype=bf16 already keeps m/l f32 (the 'mixed "
                "split'); interleaved min-of-%d rounds per variant, one "
                "process" % args.rounds,
        "rows": rows,
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
