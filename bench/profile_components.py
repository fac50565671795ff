"""Component-level profiling at the flagship (CogVideoX 17776-token) shape:
quant pipeline pieces, attention variants by fuse mode, and floor ops.

Consolidates the round-1 profiling scratch scripts; numbers recorded in
PERFORMANCE.md. Run on the real chip:

  python bench/profile_components.py [--floor] [--quant] [--attn]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time


def _t(name, fn, args, r1=20, r2=60):
    dt = measure_op_time(jax.jit(fn), args, r1=r1, r2=r2)
    print(f"{name:32s} {dt*1e3:8.3f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--floor", action="store_true", help="bandwidth floor ops")
    p.add_argument("--quant", action="store_true", help="quant pipeline pieces")
    p.add_argument("--attn", action="store_true", help="attention fuse modes")
    p.add_argument("--seq", type=int, default=17776)
    args = p.parse_args()
    if not (args.floor or args.quant or args.attn):
        args.floor = args.quant = args.attn = True

    B, H, S, D = 1, 30, args.seq, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    print(f"config b{B} h{H} s{S} d{D} on {jax.devices()[0].device_kind}")

    if args.floor:
        _t("x+1 (rw floor)", lambda k: k + 1, (k,))
        _t("sum() scalar", lambda k: jnp.sum(k.astype(jnp.float32)), (k,))
        _t("k_mean", lambda k: quant_ops.k_mean(k), (k,))

    if args.quant:
        _t("quant_q per-token", lambda q: quant_ops.quant_int8(q, gran="per_token"), (q,))
        _t(
            "quant_k+km, K^T layout",
            lambda k: quant_ops.quant_int8(
                k, quant_ops.k_mean(k), gran="per_token", layout="ds"
            ),
            (k,),
        )

    if args.attn:
        _t("fp16 FA2 kernel", lambda q, k, v: lq.flash_attention_fp(q, k, v), (q, k, v), 8, 24)
        for mode in (False, "q", True):
            _t(
                f"int8 fuse_quant={mode!r}",
                lambda q, k, v, m=mode: lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, fuse_quant=m),
                (q, k, v),
                8,
                24,
            )


if __name__ == "__main__":
    main()
