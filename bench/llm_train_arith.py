"""Train the toy arithmetic LLM and commit its checkpoint — the model the
accuracy ladder grades (VERDICT r4 #2: grade a model with real logit
margins, not random weights).

Reference purpose: inferenceKit grades a REAL model on GSM8K/MATH
(reference src/triton/utils/inferenceKit/inference.py:1-136); zero-egress
means no pretrained weights, so the framework trains its own on synthetic
fixed-format addition (models/train.py) and the ladder
(bench/llm_accuracy_eval.py --checkpoint) grades THAT per cache mode.

Usage: timeout 550 python bench/llm_train_arith.py \
           [--steps 3000] [--ckpt eval_out/arith_llm.npz] \
           [--json TRAIN_ARITH.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import train as T
from lowbit_quant_fa2_paddle_tpu.utils.checkpoint import save_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-eval", type=int, default=128)
    ap.add_argument("--ckpt", type=str, default="eval_out/arith_llm.npz")
    ap.add_argument("--json", type=str, default="TRAIN_ARITH.json")
    args = ap.parse_args()

    cfg = T.arith_llm_config()
    t0 = time.perf_counter()

    def log(done, loss):
        print(f"[train_arith] step {done}/{args.steps}: loss {loss:.4f} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr,
              flush=True)

    params, losses = T.train_toy_llm(
        cfg, steps=args.steps, batch=args.batch, seq_len=args.seq_len,
        lr=args.lr, verbose=log,
    )
    train_s = time.perf_counter() - t0

    prompts, answers = T.make_eval_prompts(args.n_eval, few_shot=3)
    acc_bf16, _ = T.eval_accuracy(
        params, T.arith_llm_config(kv_bits=16), prompts, answers,
        batch=min(args.n_eval, 64),
    )
    print(f"[train_arith] held-out task accuracy (bf16 cache): {acc_bf16:.3f}",
          file=sys.stderr)

    save_params(args.ckpt, params)
    ckpt_mb = os.path.getsize(
        args.ckpt if args.ckpt.endswith(".npz") else args.ckpt + ".npz"
    ) / 1e6

    out = {
        "task": "fixed-format 2-digit addition LM (models/train.py)",
        "config": dict(dim=cfg.dim, depth=cfg.depth, h=cfg.num_heads,
                       hk=cfg.num_kv_heads, vocab=cfg.vocab,
                       steps=args.steps, batch=args.batch,
                       seq_len=args.seq_len, lr=args.lr,
                       device=jax.devices()[0].device_kind),
        "loss_first_last": [round(losses[0], 4), round(losses[-1], 4)],
        "loss_curve_per_chunk": [round(l, 4) for l in losses],
        "train_wall_s": round(train_s, 1),
        "heldout_task_accuracy_bf16": round(acc_bf16, 4),
        "n_eval": args.n_eval,
        "checkpoint": args.ckpt,
        "checkpoint_mb": round(ckpt_mb, 1),
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items()
                      if k != "loss_curve_per_chunk"}))


if __name__ == "__main__":
    main()
