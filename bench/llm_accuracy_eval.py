"""Task-level accuracy ladder for the quantized KV-cache modes
(the inferenceKit purpose: grade a REAL model per inference config —
/root/reference/src/triton/utils/inferenceKit/inference.py:1-136).

Default mode grades the TRAINED arithmetic LLM (bench/llm_train_arith.py,
checkpoint committed at eval_out/arith_llm.npz): each cache mode
greedy-generates over a held-out problem set through the full evalkit
pipeline — `run_inference` with the DEFAULT numeric grading
(extract_answer + grade_numeric, the reference's GSM8K grading path) — so
"task_accuracy" is real exact-match on margined logits, not argmax-tie
noise. A window/sink ladder and an n-gram-speculative serving-engine rung
(token agreement reported; bit-identity is asserted by the CPU tests where
the XLA programs match) run on the same model.

`--random-weights` keeps the r4 pessimistic-bound ladder (generation
exact-match vs the bf16 cache on a random-weight model) for continuity.

Writes eval_out/llm_result.json — the per-cache-mode accuracy table the
serving docs cite when advertising int8/k4v8/int4 cache modes.

Usage: python bench/llm_accuracy_eval.py [--checkpoint eval_out/arith_llm.npz]
           [--json eval_out/llm_result.json]
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


# ---------------------------------------------------------------- trained


def trained_ladder(args):
    from lowbit_quant_fa2_paddle_tpu.models import train as T
    from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine
    from lowbit_quant_fa2_paddle_tpu.utils.checkpoint import load_params

    cfg0 = T.arith_llm_config()
    like = llm.init_llm_params(jax.random.PRNGKey(0), cfg0)
    params = load_params(args.checkpoint, like)
    prompts, answers = T.make_eval_prompts(args.n_prompts, few_shot=3)
    questions = [T.decode_ids(p) for p in prompts]
    examples = [
        {"question": q, "answer": f"#### {int(a)}"}
        for q, a in zip(questions, answers)
    ]

    def gen_fn_for(cfg_mode):
        def generate_batch(qs, icfg):
            toks = jnp.asarray([T.encode(q) for q in qs], jnp.int32)
            out = llm.generate(params, toks, icfg.max_new_tokens, cfg_mode)
            return [T.decode_ids(row) for row in np.asarray(out)]

        return generate_batch

    def ladder_row(name, cfg_mode):
        with tempfile.TemporaryDirectory() as td:
            icfg = InferenceConfig(
                model=f"arith_{name}", dataset="synthetic-arith",
                batch_size=args.n_prompts, max_new_tokens=T.ANS_LEN,
                output_dir=td, resume=False,
            )
            # default grading: extract_answer + grade_numeric — the
            # reference's GSM8K numeric-equality path
            summary = run_inference(icfg, gen_fn_for(cfg_mode),
                                    examples=examples)
        outs = [r["output"] for r in summary["results"]]
        return summary["accuracy"], outs

    table = {}
    gold_outs = None
    for mode, (kb, vb) in MODES.items():
        cfg_mode = T.arith_llm_config(kv_bits=8, k_bits=kb, v_bits=vb)
        acc, outs = ladder_row(mode, cfg_mode)
        if mode == "bf16":
            gold_outs = outs
        table[mode] = {
            "task_accuracy": round(acc, 4),
            "generation_agreement_vs_bf16": round(
                float(np.mean([a == b for a, b in zip(outs, gold_outs)])), 4),
        }
        print(f"[llm_acc] {mode:5s}: task {acc:.3f} | agree-bf16 "
              f"{table[mode]['generation_agreement_vs_bf16']:.3f}",
              file=sys.stderr)

    # window/sink ladder: the question spans the last 6 positions, so a
    # 16-token window (+4 sinks) must retain the answer-relevant context
    wtable = {}
    for mode in ("bf16", "int8", "k4v8"):
        kb, vb = MODES[mode]
        cfg_w = T.arith_llm_config(kv_bits=8, k_bits=kb, v_bits=vb,
                                   window_size=16, sink_size=4)
        acc, _ = ladder_row(f"{mode}_w16s4", cfg_w)
        wtable[mode] = {"task_accuracy": round(acc, 4)}
        print(f"[llm_acc] {mode:5s} w16s4: task {acc:.3f}", file=sys.stderr)

    # speculative serving rung: the n-gram engine must emit the EXACT
    # plain-engine stream (asserted), so its task accuracy is the plain
    # engine's — reported with the acceptance rate
    spec = {}
    n_spec = min(args.n_prompts, 16)
    for spec_on in (False, True):
        scfg = ServingConfig(
            page_size=8, num_pages=96, max_batch=8, kv_bits=8,
            prefix_caching=False,
            spec_ngram=2 if spec_on else 0, spec_k=3,
        )
        eng = ServingEngine(params, cfg0, scfg)
        rids = [
            eng.add_request([int(t) for t in prompts[i]], T.ANS_LEN,
                            eos_token=T.EOS)
            for i in range(n_spec)
        ]
        done = eng.run()
        preds = [T.decode_ids(done[r][:3]) for r in rids]
        key = "engine_spec_ngram" if spec_on else "engine_plain"
        spec[key] = {
            "task_accuracy": round(
                float(np.mean([p == a for p, a in
                               zip(preds, answers[:n_spec])])), 4),
            "outputs": [done[r] for r in rids],
        }
        if spec_on:
            spec[key]["spec_tokens_per_round"] = eng.stats().get(
                "spec_tokens_per_round")
    # Identity is structural on matching XLA programs (CPU tests assert it
    # bit-for-bit); on hardware the multi-token verify is a different
    # program than the single-token tick, so report agreement instead of
    # crashing an 8-minute eval on one near-argmax tie.
    ident = spec["engine_plain"]["outputs"] == spec["engine_spec_ngram"]["outputs"]
    n_tok = sum(len(t) for t in spec["engine_plain"]["outputs"]) or 1
    n_match = sum(
        sum(a == b for a, b in zip(x, y))
        for x, y in zip(spec["engine_plain"]["outputs"],
                        spec["engine_spec_ngram"]["outputs"])
    )
    for k in spec:
        spec[k].pop("outputs")
        spec[k]["tokens_identical"] = bool(ident)
        spec[k]["token_agreement"] = round(n_match / n_tok, 4)
    print(f"[llm_acc] engine spec: {spec}", file=sys.stderr)

    return {
        "model": "TRAINED arithmetic LLM (bench/llm_train_arith.py; "
                 "checkpoint eval_out/arith_llm.npz, TRAIN_ARITH.json)",
        "task": "held-out fixed-format 2-digit addition, few-shot prompts "
                "(models/train.py)",
        "metric": "task exact-match via the evalkit default numeric "
                  "grading (extract_answer + grade_numeric — the "
                  "reference's GSM8K path)",
        "config": dict(dim=cfg0.dim, depth=cfg0.depth, h=cfg0.num_heads,
                       hk=cfg0.num_kv_heads, n_prompts=args.n_prompts,
                       device=jax.devices()[0].device_kind),
        "table": table,
        "window_table": wtable,
        "serving_spec": spec,
    }


# ----------------------------------------------------- random (r4 ladder)


def make_examples(n, prompt_len, vocab, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {"question": " ".join(map(str, rng.randint(0, vocab, size=prompt_len)))}
        for _ in range(n)
    ]


def random_weight_ladder(args):
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

    return {
        "config": dict(**{k: str(v) if k == "dtype" else v
                          for k, v in base.items()},
                       n_prompts=args.n_prompts, max_new=args.max_new,
                       device=jax.devices()[0].device_kind,
                       metric="greedy generation exact-match vs the "
                              "bf16-cache model (fixed seed)",
                       caveat="RANDOM-WEIGHT logits sit near argmax ties, "
                              "so these rates are a PESSIMISTIC bound on "
                              "trained-model behavior — see the trained "
                              "ladder (default mode) for task accuracy "
                              "(kernel-level cos: int8 0.9999+, k4v8 "
                              "0.993, int4 0.995 per token; errors "
                              "compound over 32 greedy steps here)"),
        "table": table,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-prompts", type=int, default=None,
                    help="default: 64 (trained ladder) / 32 (the committed "
                         "r4 --random-weights ladder size, kept for "
                         "comparability)")
    ap.add_argument("--prompt-len", type=int, default=32)  # random mode only
    ap.add_argument("--max-new", type=int, default=32)  # random mode only
    ap.add_argument("--checkpoint", type=str, default="eval_out/arith_llm.npz")
    ap.add_argument("--random-weights", action="store_true",
                    help="run the r4 random-weight pessimistic-bound ladder "
                         "instead of grading the trained checkpoint")
    ap.add_argument("--json", type=str, default="eval_out/llm_result.json")
    args = ap.parse_args()

    if args.n_prompts is None:
        args.n_prompts = 32 if args.random_weights else 64
    if args.random_weights:
        out = random_weight_ladder(args)
    else:
        out = trained_ladder(args)

    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
