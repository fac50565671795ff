"""Interactive decode REPL over the quantized-KV LLM path.

The reference ships an interactive inference REPL in its eval kit
(src/triton/utils/inferenceKit + play.py: load model, loop over typed
prompts, print completions). This is the TPU-native equivalent wired to
the in-repo toy LLM (zero-egress: byte-level vocab, random weights — the
point is driving the int8 prefill -> quantized-cache streaming decode
serving path interactively, not language quality).

  python example/llm_repl.py --kv-bits 4 --w-bits 8
  > hello
  [32 tokens in 0.41 s | 78.0 tok/s]  b'...'
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.models import llm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--new-tokens", type=int, default=32)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kv-heads", type=int, default=2)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--max-seq", type=int, default=512)
    p.add_argument("--kv-bits", type=int, default=8, choices=[8, 4])
    p.add_argument("--w-bits", type=int, default=0, choices=[0, 8, 4])
    p.add_argument("--attn-impl", default="int8")
    args = p.parse_args()

    cfg = llm.tiny_llm_config(
        vocab=256, dim=args.dim, depth=args.depth, num_heads=args.heads,
        num_kv_heads=args.kv_heads, max_seq=args.max_seq, kv_bits=args.kv_bits,
    )
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    if args.w_bits:
        params = llm.quantize_llm_params(params, bits=args.w_bits)
    step = jax.jit(functools.partial(llm_step, cfg=cfg))
    print(
        f"toy byte-LLM ready: dim{cfg.dim} x{cfg.depth} h{cfg.num_heads}/"
        f"hk{cfg.num_kv_heads} kv_bits={cfg.kv_bits} "
        f"w={'int%d' % args.w_bits if args.w_bits else 'dense'} on "
        f"{jax.devices()[0].platform}. Ctrl-D to exit.",
        file=sys.stderr,
    )
    while True:
        try:
            line = input("> ")
        except (EOFError, KeyboardInterrupt):
            print(file=sys.stderr)
            return
        if not line.strip():
            continue
        prompt = jnp.asarray(
            [list(line.encode("utf-8")[: cfg.max_seq - args.new_tokens - 1])],
            jnp.int32,
        )
        t0 = time.perf_counter()
        logits, caches = llm.llm_prefill(params, prompt, cfg, attn_impl=args.attn_impl)
        token = jnp.argmax(logits[:, -1], axis=-1)
        out = [int(token[0])]
        for _ in range(args.new_tokens - 1):
            logits, caches = step(params, token, caches)
            token = jnp.argmax(logits, axis=-1)
            out.append(int(token[0]))
        dt = time.perf_counter() - t0
        print(
            f"[{len(out)} tokens in {dt:.2f} s | {len(out) / dt:.1f} tok/s] "
            f"{bytes(b % 256 for b in out)!r}"
        )


def llm_step(params, token, caches, *, cfg):
    return llm.llm_decode_step(params, token, caches, cfg=cfg)


if __name__ == "__main__":
    main()
