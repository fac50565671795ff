"""Long-context decode benchmark: single-token attention over a KV cache at
bf16 / int8 / int4 / mixed precision.

Decode is HBM-bandwidth-bound (the whole cache streams through VMEM per
token), so bytes-per-token is the metric that matters: int8 halves a bf16
cache's stream, int4 halves it again. This is the TPU counterpart of the
reference's decode experiments (src/triton/utils/quant_sglang_triton_attn.py,
KIVI caches in src/triton/utils/quant/new_pack.py).

Usage: python bench/decode_bench.py [--seq 131072] [--json out.json]
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
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seq", type=int, default=131072)
    ap.add_argument("--block-kv", type=int, default=None,
                    help="KV block override; default = tuned cache winner "
                         "(bench/autotune.py --space decode) or heuristic")
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
    vc4, vs4 = quant_int4(v, gran="per_token")
    jax.block_until_ready((kc8, vc8, kc4, vc4))

    # Exact reference at a down-sampled length (full [S] exact oracle is
    # fine here: Sq=1). Use the fp Pallas kernel as oracle at full length.
    o_ref = flash_attention_fp(
        q.reshape(b, h, 1, d).astype(jnp.bfloat16),
        jnp.repeat(k, h // hk, axis=1).astype(jnp.bfloat16),
        jnp.repeat(v, h // hk, axis=1).astype(jnp.bfloat16),
    )[:, :, 0]

    bk = args.block_kv
    configs = {
        "bf16": dict(
            fn=jax.jit(lambda q, kk, vv, l: dec.decode_attention(
                q, kk, vv, jnp.ones((b, hk, s), jnp.float32), l, block_kv=bk)),
            fargs=(q, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), lengths),
            bytes_tok=2 * s * hk * d * 2,
        ),
        "int8": dict(
            fn=jax.jit(lambda q, kk, vv, ks, vs, l: dec.decode_attention(
                q, kk, vv, ks, l, v_scale=vs, block_kv=bk)),
            fargs=(q, kc8, vc8, ks8, vs8, lengths),
            bytes_tok=2 * s * hk * d,
        ),
        "k4v8": dict(
            fn=jax.jit(lambda q, kk, vv, ks, vs, l: dec.decode_attention(
                q, kk, vv, ks, l, v_scale=vs, k_bits=4, v_bits=8, block_kv=bk)),
            fargs=(q, kc4, vc8, ks4, vs8, lengths),
            bytes_tok=s * hk * d // 2 + s * hk * d,
        ),
        "int4": dict(
            fn=jax.jit(lambda q, kk, vv, ks, vs, l: dec.decode_attention(
                q, kk, vv, ks, l, v_scale=vs, k_bits=4, v_bits=4, block_kv=bk)),
            fargs=(q, kc4, vc4, ks4, vs4, lengths),
            bytes_tok=s * hk * d,
        ),
    }

    results = {}
    t_bf16 = None
    for name, cfg in configs.items():
        o = jax.block_until_ready(cfg["fn"](*cfg["fargs"]))
        cos = float(cosine_similarity(o, o_ref))
        # Sub-ms per-token kernels: heavy reps or the transport latency
        # spikes flap results bimodally by up to 2.5x (verify-skill note).
        t = measure_op_time(cfg["fn"], cfg["fargs"], r1=60, r2=180, samples=8)
        gbs = cfg["bytes_tok"] / t / 1e9
        if name == "bf16":
            t_bf16 = t
        results[name] = dict(
            ms_per_token=round(t * 1e3, 3),
            effective_gb_s=round(gbs, 1),
            tokens_s=round(1.0 / t, 1),
            speedup_vs_bf16=round(t_bf16 / t, 2),
            cos_vs_fp=round(cos, 6),
            cache_bytes=cfg["bytes_tok"],
        )
        print(f"[decode] {name:5s}: {t*1e3:7.3f} ms/tok | {gbs:6.1f} GB/s | "
              f"{t_bf16/t:4.2f}x vs bf16 | cos {cos:.6f}", file=sys.stderr)

    from lowbit_quant_fa2_paddle_tpu.utils.benchmark import device_memory_stats

    out = dict(
        config=dict(b=b, h=h, hk=hk, d=d, s=s, block_kv=bk,
                    device=jax.devices()[0].device_kind,
                    device_memory=device_memory_stats()),
        results=results,
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
