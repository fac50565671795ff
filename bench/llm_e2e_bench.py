"""Model-level long-context decode benchmark: generation tokens/s through
``models/llm.decode_tokens`` (the full transformer step — attention over the
KV cache + all projections/MLP — scanned on device), bf16 vs int8 vs k4v8
vs int4 caches.

This is the model-level counterpart of DECODE_TPU.json's kernel-level
record (and the reason the reference's decode kernel exists:
/root/reference/src/triton/utils/quant_sglang_triton_attn.py:43-243 serves
LLM decode, not an isolated op). Config is decode-bound by construction:
h32 x hd128 (dim 4096), hk8 GQA, 32K-128K contexts — at these shapes the
per-step cache stream (0.5-4.3 GB) dominates the fixed weight stream, which
is where cache precision pays.

Methodology notes (honesty):
* The prompt KV is SYNTHETIC: caches are filled with per-token-quantized
  random K/V (the exact math `append_kv`/prefill uses — dec.quantize_token)
  because a real 128K prefill at batch 4 exceeds single-chip activation
  memory. The measured object is the real decode path: every step runs the
  full jitted transformer step including cache append and greedy argmax,
  identical to `generate`'s decode segment.
* All cache modes are filled from the SAME random K/V, so the reported
  logits cosine vs the bf16 mode isolates cache-quantization error.
* Tokens/s comes from `measure_op_time` over one N-token scanned segment
  (the production dispatch granularity — one host->device round trip per
  segment, not per token).

Usage:
  python bench/llm_e2e_bench.py --ctx 131072 --modes bf16 int8 k4v8 int4 \
      --json LLM_E2E_TPU.json      # merges into an existing json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.models import llm
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    device_memory_stats,
    measure_op_time,
)

MODES = {
    # name -> (k_bits, v_bits)
    "bf16": (16, 16),
    "int8": (8, 8),
    "k4v8": (4, 8),
    "int4": (4, 4),
}


def make_cfg(args, k_bits, v_bits):
    return llm.LLMConfig(
        vocab=256,
        dim=args.heads * args.head_dim,
        depth=args.depth,
        num_heads=args.heads,
        num_kv_heads=args.kv_heads,
        max_seq=args.ctx + args.gen_block,  # ctx multiple of 2048 keeps the
        # cache a block multiple -> no whole-cache pad copy inside the step
        dtype=jnp.bfloat16,
        kv_bits=8,
        k_bits=k_bits,
        v_bits=v_bits,
        window_size=args.window or None,
        sink_size=args.sink,
    )


def fill_caches(cfg, b, ctx, seed=0):
    """Per-layer caches holding `ctx` synthetic tokens, quantized with the
    production per-token math (dec.quantize_token — what append_kv runs)."""
    hk, hd = cfg.num_kv_heads, cfg.head_dim
    pad = cfg.max_seq - ctx
    caches = []
    for i in range(cfg.depth):
        kk, kv = jax.random.split(jax.random.PRNGKey(seed + 101 * i))
        k = jax.random.normal(kk, (b, hk, ctx, hd), jnp.bfloat16)
        v = jax.random.normal(kv, (b, hk, ctx, hd), jnp.bfloat16)
        kq, ks = dec.quantize_token(k, bits=cfg.eff_k_bits)
        vq, vs = dec.quantize_token(v, bits=cfg.eff_v_bits)
        caches.append({
            "k": jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0))),
            "v": jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0))),
            "k_scale": jnp.pad(ks, ((0, 0), (0, 0), (0, pad)),
                               constant_values=1.0),
            "v_scale": jnp.pad(vs, ((0, 0), (0, 0), (0, pad)),
                               constant_values=1.0),
            "length": jnp.full((b,), ctx, jnp.int32),
        })
        jax.block_until_ready(caches[-1]["k"])
        del k, v, kq, vq
    return caches


def cache_gbytes(caches):
    return sum(
        sum(x.size * x.dtype.itemsize for x in c.values()) for c in caches
    ) / 2**30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--ctx", type=int, default=131072)
    ap.add_argument("--gen-block", type=int, default=2048,
                    help="cache slack past ctx (block multiple)")
    ap.add_argument("--n-tokens", type=int, default=32,
                    help="tokens generated per measured dispatch")
    ap.add_argument("--modes", nargs="+", default=list(MODES),
                    choices=list(MODES))
    ap.add_argument("--window", type=int, default=0,
                    help="sliding-window attention (Mistral-class) — the "
                         "model-level streaming-decode row (compacted "
                         "banded page walk)")
    ap.add_argument("--sink", type=int, default=0,
                    help="StreamingLLM sink tokens (with --window)")
    ap.add_argument("--real-prefill", action="store_true",
                    help="build the cache by actually prefilling a random "
                         "ctx-token prompt through llm_prefill_chunked "
                         "(bounded-memory chunked prefill) instead of the "
                         "synthetic fill — validates that decode timing is "
                         "independent of how the cache was produced")
    ap.add_argument("--w-bits", type=int, default=0, choices=[0, 8, 4],
                    help="also quantize the WEIGHTS per-channel (fused gemv "
                         "path) — compounds with cache precision; rows are "
                         "keyed mode+wN@ctx")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    b, n = args.batch, args.n_tokens
    results = {}
    if args.json and os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f).get("results", {})

    tok0 = jax.random.randint(jax.random.PRNGKey(7), (b,), 0, 256)
    logits_ref = None
    params = None
    for mode in args.modes:
        kb, vb = MODES[mode]
        cfg = make_cfg(args, kb, vb)
        if params is None:
            params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
            if args.w_bits:
                params = llm.quantize_llm_params(params, bits=args.w_bits)
        if args.real_prefill:
            import time as _t

            prompt = jax.random.randint(
                jax.random.PRNGKey(3), (b, args.ctx), 0, 256
            )
            t0 = _t.perf_counter()
            _, caches = llm.llm_prefill_chunked(params, prompt, cfg, chunk=8192)
            jax.block_until_ready(caches[0]["k"])
            prefill_s = _t.perf_counter() - t0
            print(f"[llm_e2e] chunked prefill {args.ctx} tokens x b{b}: "
                  f"{prefill_s:.1f}s", file=sys.stderr)
        else:
            prefill_s = None
            caches = fill_caches(cfg, b, args.ctx)
        gb = cache_gbytes(caches)

        # one full decode step for the accuracy probe (logits vs bf16 mode)
        step = jax.jit(lambda p, t, c: llm.llm_decode_step(p, t, c, cfg)[0])
        lo = jax.block_until_ready(step(params, tok0, caches))
        wtag = f"+w{args.w_bits}" if args.w_bits else ""
        rtag = "+realprefill" if args.real_prefill else ""
        gtag = f"+win{args.window}" if args.window else ""
        key = f"{mode}{wtag}{gtag}{rtag}@{args.ctx}"
        cos = None
        if mode == "bf16":
            logits_ref = lo
        elif logits_ref is not None:
            a = lo.astype(jnp.float32).ravel()
            r = logits_ref.astype(jnp.float32).ravel()
            cos = float(a @ r / (jnp.linalg.norm(a) * jnp.linalg.norm(r)))

        fn = jax.jit(
            lambda p, t, c: llm.decode_tokens(p, t, c, n, cfg)[0]
        )
        jax.block_until_ready(fn(params, tok0, caches))  # compile
        t = measure_op_time(fn, (params, tok0, caches), r1=2, r2=6, samples=4)
        mem = device_memory_stats()
        per_tok = t / n
        results[key] = {
            "ms_per_token": round(per_tok * 1e3, 3),
            "tokens_s_per_seq": round(1.0 / per_tok, 2),
            "tokens_s_total": round(b / per_tok, 2),
            "cache_gb": round(gb, 2),
            "logits_cos_vs_bf16": None if cos is None else round(cos, 6),
            "device_memory": mem,
        }
        if prefill_s is not None:
            results[key]["chunked_prefill_s"] = round(prefill_s, 2)
        ref_key = f"bf16{wtag}@{args.ctx}"
        if ref_key in results:
            results[key]["speedup_vs_bf16"] = round(
                results[ref_key]["ms_per_token"] / results[key]["ms_per_token"], 3
            )
        print(f"[llm_e2e] {key:13s}: {per_tok*1e3:7.3f} ms/tok | "
              f"{b/per_tok:8.1f} tok/s total | cache {gb:5.2f} GB | "
              f"cos {cos if cos is not None else 1.0}", file=sys.stderr)
        del caches

    out = {
        "config": dict(
            b=b, h=args.heads, hk=args.kv_heads, d=args.head_dim,
            depth=args.depth, dim=args.heads * args.head_dim,
            n_tokens_per_dispatch=n,
            device=jax.devices()[0].device_kind,
            note="synthetic cache fill (production quantize_token math); "
                 "measured object = full scanned transformer decode step "
                 "(models/llm.decode_tokens)",
        ),
        "results": results,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
