"""Within-process A/B of the decode kernel's MXU operand domain
(compute_mode): f32 upcast chain (r2) vs integer-domain QK vs full integer.

Targets VERDICT r2 weak #3: int8 decode streamed 541 GB/s vs bf16's 772 —
a bandwidth-proportional win would be ~1.8-1.9x; the hypothesis is the
whole-tile f32 upcast of the int8 codes before each dot. One process, one
JSON line per variant.

Usage: timeout 550 python bench/verify_decode_int.py [--seq 131072]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int4, quant_int8
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seq", type=int, default=131072)
    ap.add_argument("--block-kv", type=int, default=2048)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    b, h, hk, d, s = args.batch, args.heads, args.kv_heads, args.head_dim, args.seq
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hk, s, d), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)

    kc8, ks8 = quant_int8(k, gran="per_token")
    vc8, vs8 = quant_int8(v, gran="per_token")
    kc4, ks4 = quant_int4(k, gran="per_token")
    jax.block_until_ready((kc8, vc8, kc4))
    bk = args.block_kv

    def int8_mode(mode):
        return dict(
            fn=jax.jit(lambda q, kk, vv, ks, vs, l: dec.decode_attention(
                q, kk, vv, ks, l, v_scale=vs, block_kv=bk, compute_mode=mode)),
            fargs=(q, kc8, vc8, ks8, vs8, lengths),
            bytes_tok=2 * s * hk * d,
        )

    def k4_mode(mode):
        return dict(
            fn=jax.jit(lambda q, kk, vv, ks, vs, l: dec.decode_attention(
                q, kk, vv, ks, l, v_scale=vs, k_bits=4, v_bits=8, block_kv=bk,
                compute_mode=mode)),
            fargs=(q, kc4, vc8, ks4, vs8, lengths),
            bytes_tok=s * hk * d // 2 + s * hk * d,
        )

    configs = {
        "bf16": dict(
            fn=jax.jit(lambda q, kk, vv, l: dec.decode_attention(
                q, kk, vv, jnp.ones((b, hk, s), jnp.float32), l, block_kv=bk)),
            fargs=(q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), lengths),
            bytes_tok=2 * s * hk * d * 2,
        ),
        "int8_f32": int8_mode("f32"),
        "int8_intqk": int8_mode("int_qk"),
        "int8_int": int8_mode("int"),
        "k4v8_f32": k4_mode("f32"),
        "k4v8_intqk": k4_mode("int_qk"),
    }

    results = {}
    o_ref = None
    t_bf16 = None
    for name, cfg in configs.items():
        o = jax.block_until_ready(cfg["fn"](*cfg["fargs"]))
        if o_ref is None:
            o_ref = o  # bf16 chain is the accuracy anchor
        cos = float(cosine_similarity(o, o_ref))
        t = measure_op_time(cfg["fn"], cfg["fargs"], r1=60, r2=180, samples=8)
        if t_bf16 is None:
            t_bf16 = t
        gbs = cfg["bytes_tok"] / t / 1e9
        results[name] = dict(
            ms_per_token=round(t * 1e3, 3), effective_gb_s=round(gbs, 1),
            speedup_vs_bf16=round(t_bf16 / t, 3), cos_vs_bf16=round(cos, 6),
        )
        print(f"[decode-int] {name:11s}: {t*1e3:7.3f} ms | {gbs:6.1f} GB/s | "
              f"{t_bf16/t:5.2f}x bf16 | cos {cos:.6f}", file=sys.stderr)

    out = dict(config=dict(b=b, h=h, hk=hk, d=d, s=s, block_kv=bk,
                           device=jax.devices()[0].device_kind),
               results=results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
