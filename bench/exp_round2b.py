"""Round-2 kernel levers, part B: mask-split + ks_uniform fast chain +
folded int8-P PV, measured on-chip at the headline config.

Usage: timeout 550 python bench/exp_round2b.py [--seq 4096] [--part 0|1|2]
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

    qT_c, q_s = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token", layout="ds"))(q)
    )
    k_c, k_s = jax.block_until_ready(
        jax.jit(lambda x: q_ops.quant_int8(x, gran="per_token"))(k)
    )
    vT = jax.block_until_ready(jnp.swapaxes(v, 2, 3))

    fp_fn = jax.jit(lambda q, k, v: flash_attention_fp(q, k, v))
    o_fp = jax.block_until_ready(fp_fn(q, k, v))
    o_fp_c = jax.block_until_ready(
        jax.jit(lambda q, k, v: flash_attention_fp(q, k, v, is_causal=True))(q, k, v)
    )

    def run(name, kc, ksc, vt, causal=False, vs=None, **kw):
        fn = jax.jit(
            lambda qc, kc, vt, qs, ksc: lowbit_attention_km(
                qc, kc, vt, qs, ksc, v_scale=vs, is_causal=causal, **kw
            )
        )
        o = jnp.swapaxes(fn(qT_c, kc, vt, q_s, ksc), 2, 3)
        cos = float(cosine_similarity(o, o_fp_c if causal else o_fp))
        t = measure_op_time(fn, (qT_c, kc, vt, q_s, ksc))
        fl = attention_flops(B, H, D, S, S, causal=causal)
        print(
            f"[exp2b] {name}: {t*1e3:.2f} ms = {tflops(fl, t):.1f} TF cos={cos:.6f}",
            file=sys.stderr,
        )
        return t

    if args.part in (-1, 0):
        run("km per-token (baseline, mask-split)", k_c, k_s, vT)
        kb_c, kb_s = jax.block_until_ready(
            jax.jit(lambda x: q_ops.quant_int8(x, gran="per_block", block=512))(k)
        )
        run("km ks_uniform bk512", kb_c, kb_s, vT, k_scale_uniform=True)
    if args.part in (-1, 1):
        v_codes, v_s, _ = jax.block_until_ready(
            jax.jit(q_ops.quant_v_int8_per_channel)(v)
        )
        vT_c = jax.block_until_ready(jnp.swapaxes(v_codes, 2, 3))
        run("km pv_int8 folded (per-token K)", k_c, k_s, vT_c, vs=v_s, pv_int8=True)
        kb_c, kb_s = jax.block_until_ready(
            jax.jit(lambda x: q_ops.quant_int8(x, gran="per_block", block=512))(k)
        )
        run(
            "km ks_uniform + pv_int8 folded", kb_c, kb_s, vT_c,
            vs=v_s, pv_int8=True, k_scale_uniform=True,
        )
    if args.part in (-1, 2):
        # causal: the mask-split alone should help (interior blocks skip
        # iota/where); then the fast chain on top.
        run("km causal per-token", k_c, k_s, vT, causal=True)
        kb_c, kb_s = jax.block_until_ready(
            jax.jit(lambda x: q_ops.quant_int8(x, gran="per_block", block=512))(k)
        )
        run("km causal ks_uniform", kb_c, kb_s, vT, causal=True, k_scale_uniform=True)


if __name__ == "__main__":
    main()
