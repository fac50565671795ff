"""Continuous-batching serving demo: N concurrent requests, one engine.

The reference serves its decode path through external sglang (reference
src/triton/utils/main.py:14-15); here the whole loop is in-repo — native
C++ scheduler (admission + paged-KV pool) driving one jitted batched decode
step over the quantized paged cache.

  python example/serve_llm.py --requests 6 --max-new 24 --kv-bits 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import llm as L
from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--max-new", type=int, default=24)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--kv-bits", type=int, default=8, choices=[8, 4])
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--num-pages", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--window", type=int, default=0,
                    help="sliding-window model: rolling decode window + "
                         "page reclamation (0 = full causal)")
    ap.add_argument("--sink", type=int, default=0,
                    help="StreamingLLM sink tokens kept visible with --window")
    ap.add_argument("--spec-ngram", type=int, default=0,
                    help="n-gram speculative decoding: draft-model-free "
                         "prompt lookup, one multi-token verify per tick "
                         "(exact greedy)")
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--multi-step", type=int, default=1,
                    help="scan this many decode steps per dispatch when "
                         "admission is quiescent (4.7x steady tokens/s on "
                         "the relay transport; SERVING_TPU.json)")
    ap.add_argument("--prefill-budget", type=int, default=0,
                    help="budgeted chunked-prefill scheduling (Sarathi/"
                         "SplitFuse class): admissions prefill at most this "
                         "many tokens per tick interleaved with decode, so "
                         "a long prompt never stalls live slots (0 = "
                         "blocking one-shot prefill)")
    ap.add_argument("--async-fetch", action="store_true",
                    help="device-resident token feedback; values fetch only "
                         "at retirements (3.5x mixed tokens/s on the relay)")
    args = ap.parse_args()

    cfg = L.tiny_llm_config(
        vocab=256,
        dim=args.dim,
        depth=args.depth,
        num_heads=args.heads,
        num_kv_heads=args.kv_heads,
        max_seq=args.page_size * args.num_pages,
        window_size=args.window or None,
        sink_size=args.sink,
    )
    params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
    eng = ServingEngine(
        params,
        cfg,
        ServingConfig(
            page_size=args.page_size,
            num_pages=args.num_pages,
            max_batch=args.max_batch,
            kv_bits=args.kv_bits,
            spec_ngram=args.spec_ngram,
            spec_k=args.spec_k,
            multi_step=args.multi_step,
            prefill_budget=args.prefill_budget or None,
            async_fetch=args.async_fetch,
        ),
    )

    rng = np.random.RandomState(0)
    rids = []
    for i in range(args.requests):
        prompt = rng.randint(0, cfg.vocab, size=rng.randint(4, 24)).tolist()
        rids.append(eng.add_request(prompt, args.max_new))

    t0 = time.perf_counter()
    steps = 0
    while len(eng.finished) < len(rids):
        eng.step()
        steps += 1
        if steps % 8 == 0:
            s = eng.stats()
            print(
                f"step {steps:4d}: active={s['active_slots']} waiting={s['waiting']} "
                f"free_pages={s['free_pages']}/{s['num_pages']} finished={s['finished']}"
            )
        if steps > 10_000:
            raise RuntimeError("did not drain")
    wall = time.perf_counter() - t0
    done = eng.finished
    total_tokens = sum(len(v) for v in done.values())
    spec_note = ""
    if args.spec_ngram:
        spec_note = (
            f" | speculative: {eng.stats()['spec_tokens_per_round']} "
            f"tokens/verify-round"
        )
    print(f"\n{len(rids)} requests, {total_tokens} tokens in {steps} steps, "
          f"{wall:.2f} s wall ({total_tokens / wall:.1f} tok/s incl. compile)"
          f"{spec_note}")
    for rid in rids:
        print(f"  rid {rid}: {done[rid][:12]}{'...' if args.max_new > 12 else ''}")


if __name__ == "__main__":
    main()
