"""LLM decode demo: int8 prefill -> quantized KV cache -> streaming decode
(the decode-path counterpart of example/dit_generate.py; reference hosted
this in inferenceKit + the sglang decode experiments).

  python example/llm_generate.py --prompt-len 512 --new-tokens 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.models import llm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt-len", type=int, default=512)
    p.add_argument("--new-tokens", type=int, default=32)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kv-heads", type=int, default=2)
    p.add_argument("--kv-bits", type=int, default=8, choices=[8, 4],
                   help="KV cache precision (4 = nibble-packed, quarter size)")
    p.add_argument("--w-bits", type=int, default=0, choices=[0, 8, 4],
                   help="weight precision (0 = dense; 8/4 = per-channel packed "
                        "weights through the fused Pallas matmul, ops/gemv.py)")
    p.add_argument("--window", type=int, default=0,
                   help="sliding-window attention (Mistral-class): banded "
                        "prefill grid + rolling decode window, 0 = full causal")
    p.add_argument("--sink", type=int, default=0,
                   help="StreamingLLM attention sinks kept visible with "
                        "--window (anchor tokens)")
    p.add_argument("--spec-k", type=int, default=0,
                   help="speculative decoding: draft this many tokens per "
                        "round by self-speculation through an int4 KV cache "
                        "and verify them in ONE multi-token cache stream "
                        "(exact greedy; single-sequence demo path)")
    args = p.parse_args()

    cfg = llm.tiny_llm_config(
        vocab=1024, dim=args.dim, depth=4, num_heads=args.heads,
        num_kv_heads=args.kv_heads,
        max_seq=args.prompt_len + args.new_tokens + 8 + max(args.spec_k, 0),
        kv_bits=args.kv_bits,
        window_size=args.window or None,
        sink_size=args.sink,
    )
    if args.spec_k:
        import dataclasses

        draft_cfg = dataclasses.replace(cfg, kv_bits=4)
        params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
        if args.w_bits:
            params = llm.quantize_llm_params(params, bits=args.w_bits)
        prompt = jax.random.randint(
            jax.random.PRNGKey(1), (1, args.prompt_len), 0, cfg.vocab
        )
        t0 = time.perf_counter()
        toks, stats = llm.speculative_generate(
            params, prompt, args.new_tokens, cfg,
            draft_params=params, draft_cfg=draft_cfg,
            spec_k=args.spec_k, return_stats=True,
        )
        dt = time.perf_counter() - t0
        print(
            f"speculative decode (int4-cache self-draft, k={args.spec_k}): "
            f"{args.new_tokens} tokens in {dt:.2f}s | "
            f"{stats['mean_accepted']:.2f} drafts accepted/round over "
            f"{stats['rounds']} rounds | exact greedy output"
        )
        print("generated token ids:", [int(t) for t in toks[0][:16]], "...")
        return
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    w_note = "dense"
    if args.w_bits:
        params = llm.quantize_llm_params(params, bits=args.w_bits)
        w_note = f"int{args.w_bits} per-channel (fused gemv)"
    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (args.batch, args.prompt_len), 0, cfg.vocab
    )

    t0 = time.perf_counter()
    logits, caches = llm.llm_prefill(params, prompt, cfg, attn_impl="int8")
    jax.block_until_ready(logits)
    t_prefill = time.perf_counter() - t0
    token = jnp.argmax(logits[:, -1], axis=-1)

    import functools

    step = jax.jit(functools.partial(llm.llm_decode_step, cfg=cfg))
    logits, caches = step(params, token, caches)  # compile outside the timing
    token = jnp.argmax(logits, axis=-1)

    t0 = time.perf_counter()
    out = [token]
    for _ in range(args.new_tokens - 1):
        logits, caches = step(params, token, caches)
        token = jnp.argmax(logits, axis=-1)
        out.append(token)
    _ = int(token[0])  # value fetch: block_until_ready acks early on axon
    t_decode = time.perf_counter() - t0

    kv_bytes = sum(int(c["k"].size + c["v"].size) for c in caches)
    bf16_bytes = kv_bytes * 2 * (8 // args.kv_bits)
    print(
        f"prefill {args.batch}x{args.prompt_len} tokens (int8 attn): {t_prefill:.2f}s | "
        f"decode {args.new_tokens} tokens: {t_decode:.2f}s "
        f"({t_decode / args.new_tokens * 1e3:.1f} ms/tok incl host loop) | "
        f"int{args.kv_bits} KV cache {kv_bytes / 1e6:.1f} MB "
        f"(bf16 would be {bf16_bytes / 1e6:.1f} MB) | weights: {w_note}"
    )
    print("generated token ids:", [int(t) for t in jnp.stack(out, 1)[0][:16]], "...")


if __name__ == "__main__":
    main()
