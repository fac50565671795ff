"""Task-level accuracy ladder for the quantized KV-cache modes
(VERDICT r3 #7 — the inferenceKit purpose,
/root/reference/src/triton/utils/inferenceKit/inference.py).

A fixed-seed model greedy-generates over a fixed prompt set once per cache
mode through the full evalkit pipeline (`run_inference`: batching, resume,
grading, result.json). The bf16-cache generation is the gold answer;
grading is EXACT MATCH of the full generated token sequence — "what
fraction of generations are completely unchanged by cache quantization".
A mean prefix-agreement rate (tokens matching gold before first
divergence) is reported alongside as the softer metric.

Writes eval_out/llm_result.json — the per-cache-mode accuracy table the
serving docs cite when advertising k4v8/int4 cache modes.

Usage: python bench/llm_accuracy_eval.py [--json eval_out/llm_result.json]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.evalkit.config import InferenceConfig
from lowbit_quant_fa2_paddle_tpu.evalkit.inference import run_inference
from lowbit_quant_fa2_paddle_tpu.models import llm

MODES = {"bf16": (16, 16), "int8": (8, 8), "k4v8": (4, 8), "int4": (4, 4)}


def make_examples(n, prompt_len, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {"question": " ".join(map(str, rng.randint(0, vocab, size=prompt_len)))}
        for _ in range(n)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-prompts", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--json", type=str, default="eval_out/llm_result.json")
    args = ap.parse_args()

    base = dict(vocab=256, dim=256, depth=4, num_heads=8, num_kv_heads=2,
                max_seq=args.prompt_len + args.max_new + 8,
                dtype=jnp.bfloat16)
    params = llm.init_llm_params(jax.random.PRNGKey(0), llm.LLMConfig(**base))
    examples = make_examples(args.n_prompts, args.prompt_len, 256)

    def gen_fn_for(cfg_mode):
        def generate_batch(questions, icfg):
            toks = jnp.asarray(
                [[int(t) for t in q.split()] for q in questions], jnp.int32
            )
            out = llm.generate(params, toks, icfg.max_new_tokens, cfg_mode)
            return [" ".join(map(str, np.asarray(row))) for row in out]
        return generate_batch

    table = {}
    gold = None
    for mode, (kb, vb) in MODES.items():
        cfg_mode = llm.LLMConfig(**base, kv_bits=8, k_bits=kb, v_bits=vb)
        if mode == "bf16":
            # the reference generation IS the gold — grade it against
            # itself through the same pipeline (sanity: accuracy == 1.0)
            outs = gen_fn_for(cfg_mode)(
                [ex["question"] for ex in examples],
                InferenceConfig(max_new_tokens=args.max_new),
            )
            gold = outs
            for ex, g in zip(examples, gold):
                ex["answer"] = g
        with tempfile.TemporaryDirectory() as td:
            icfg = InferenceConfig(
                model=f"tiny_{mode}", dataset="synthetic",
                batch_size=args.n_prompts, max_new_tokens=args.max_new,
                output_dir=td, resume=False,
            )
            summary = run_inference(
                icfg, gen_fn_for(cfg_mode), examples=examples,
                grade_fn=lambda p, g: p == g,
            )
        prefix = []
        for r in summary["results"]:
            a, b = r["pred"].split(), r["gold"].split()
            m = 0
            while m < len(a) and m < len(b) and a[m] == b[m]:
                m += 1
            prefix.append(m / max(len(b), 1))
        table[mode] = {
            "exact_match_vs_bf16": round(summary["accuracy"], 4),
            "mean_prefix_agreement": round(float(np.mean(prefix)), 4),
        }
        print(f"[llm_acc] {mode:5s}: exact {table[mode]['exact_match_vs_bf16']:.3f}"
              f" | prefix {table[mode]['mean_prefix_agreement']:.3f}",
              file=sys.stderr)

    out = {
        "config": dict(**{k: str(v) if k == "dtype" else v
                          for k, v in base.items()},
                       n_prompts=args.n_prompts, max_new=args.max_new,
                       device=jax.devices()[0].device_kind,
                       metric="greedy generation exact-match vs the "
                              "bf16-cache model (fixed seed)",
                       caveat="random-weight logits sit near argmax ties, "
                              "so these rates are a PESSIMISTIC bound on "
                              "trained-model behavior (kernel-level cos: "
                              "int8 0.9999+, k4v8 0.993, int4 0.995 per "
                              "token; errors compound over 32 greedy "
                              "steps here)"),
        "table": table,
    }
    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
