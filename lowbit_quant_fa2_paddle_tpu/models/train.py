"""Train the in-repo toy LLM on synthetic arithmetic — so the evalkit
accuracy ladder grades a model with REAL logit margins.

The reference's inferenceKit exists to grade a real model on GSM8K/MATH
(reference src/triton/utils/inferenceKit/inference.py:1-136); in a
zero-egress image no pretrained weights exist, so the framework trains its
own: a character-level LM over fixed-format zero-padded addition streams

    ``"07+42=049;31+88=119;..."``

Every fact is exactly 10 characters (2+2 digit operands, 3-digit zero-padded
sum), so prompts and generations are FIXED-SHAPE: a few-shot prompt is
``k*10 + 6`` tokens ending in ``"ab+cd="`` and the answer is always 3 digits
+ ``';'``. That keeps every jit shape static across the whole eval ladder
(one compile per cache mode), and makes sliding-window evals meaningful
(the question always spans the last 6 positions).

Training uses the differentiable reference-attention forward
(``llm_prefill(attn_impl='ref')`` returns all-position logits); the Pallas
backward kernels' gradient parity with this oracle is certified separately
(TRAIN_TPU.json, bench/train_bench.py). Inference — the thing the ladder
measures — runs the real quantized-cache Pallas decode path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import llm as L

CHARS = "0123456789+=;"
VOCAB = len(CHARS)  # 13
EOS = CHARS.index(";")
FACT_LEN = 10  # "ab+cd=xyz;"
ANS_LEN = 4  # "xyz;"
Q_LEN = 6  # "ab+cd="


def encode(s: str) -> List[int]:
    return [CHARS.index(c) for c in s]


def decode_ids(ids) -> str:
    return "".join(CHARS[int(i)] for i in ids if 0 <= int(i) < VOCAB)


def fact(a: int, b: int) -> str:
    return f"{a:02d}+{b:02d}={a + b:03d};"


def arith_stream_batch(
    rng: np.random.RandomState, batch: int, seq_len: int
) -> np.ndarray:
    """[batch, seq_len + 1] int32 — concatenated facts, example-aligned."""
    n_facts = -(-(seq_len + 1) // FACT_LEN)
    a = rng.randint(0, 100, size=(batch, n_facts))
    b = rng.randint(0, 100, size=(batch, n_facts))
    out = np.empty((batch, seq_len + 1), np.int32)
    for i in range(batch):
        s = "".join(fact(int(x), int(y)) for x, y in zip(a[i], b[i]))
        out[i] = encode(s[: seq_len + 1])
    return out


def _loss(params, tok_in, tok_tgt, cfg):
    logits, _ = L.llm_prefill(params, tok_in, cfg, attn_impl="ref")
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, tok_tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def arith_llm_config(**kw) -> L.LLMConfig:
    base = dict(
        vocab=VOCAB, dim=256, depth=4, num_heads=8, num_kv_heads=2,
        max_seq=128, dtype=jnp.float32,
    )
    base.update(kw)
    return L.LLMConfig(**base)


def train_toy_llm(
    cfg: L.LLMConfig,
    *,
    steps: int = 3000,
    batch: int = 64,
    seq_len: int = 64,
    lr: float = 1e-3,
    seed: int = 0,
    scan_chunk: int = 50,
    verbose=None,
) -> Tuple[Dict, List[float]]:
    """Adam + cosine decay over scanned step chunks (``scan_chunk`` steps
    per device dispatch — host round trips amortize, matching the serving
    engine's multi-step pattern). Returns (params, per-chunk mean losses)."""
    import optax

    params = L.init_llm_params(jax.random.PRNGKey(seed), cfg)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(100, steps // 10), decay_steps=steps
    )
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def chunk_steps(params, opt_state, toks):  # toks [C, B, L+1]
        def body(carry, tb):
            p, s = carry
            loss, g = jax.value_and_grad(_loss)(p, tb[:, :-1], tb[:, 1:], cfg)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), toks
        )
        return params, opt_state, losses

    rng = np.random.RandomState(seed + 1)
    losses: List[float] = []
    done = 0
    while done < steps:
        c = min(scan_chunk, steps - done)
        toks = np.stack(
            [arith_stream_batch(rng, batch, seq_len) for _ in range(c)]
        )
        params, opt_state, ls = chunk_steps(params, opt_state, jnp.asarray(toks))
        losses.append(float(np.mean(np.asarray(ls))))
        done += c
        if verbose:
            verbose(done, losses[-1])
    return params, losses


def make_eval_prompts(
    n: int, *, few_shot: int = 3, seed: int = 123
) -> Tuple[np.ndarray, List[str]]:
    """Held-out eval set: ``n`` prompts ``[n, few_shot*10 + 6]`` ending in
    ``"ab+cd="`` plus the true 3-digit answer strings. The final questions
    are drawn from a seed range disjoint from training's data stream (the
    task has 10^4 facts; exact pairs may recur — the eval measures the
    learned MAP, which is the point for the cache-precision ladder)."""
    rng = np.random.RandomState(seed)
    prompts = np.empty((n, few_shot * FACT_LEN + Q_LEN), np.int32)
    answers = []
    for i in range(n):
        shots = "".join(
            fact(int(rng.randint(0, 100)), int(rng.randint(0, 100)))
            for _ in range(few_shot)
        )
        a, b = int(rng.randint(0, 100)), int(rng.randint(0, 100))
        prompts[i] = encode(shots + f"{a:02d}+{b:02d}=")
        answers.append(f"{a + b:03d}")
    return prompts, answers


def grade_answer(gen_ids, answer: str) -> bool:
    """Exact task match: the 3 generated digits equal the true sum."""
    return decode_ids(gen_ids[:3]) == answer


def eval_accuracy(
    params, cfg: L.LLMConfig, prompts: np.ndarray, answers: List[str],
    *, batch: int = 32, interpret=None,
) -> Tuple[float, List[str]]:
    """Batched greedy generation through the REAL quantized-cache decode
    path (llm.generate: int8 prefill + scanned paged decode); returns
    (task exact-match accuracy, generated answer strings)."""
    preds: List[str] = []
    for i in range(0, len(prompts), batch):
        pb = jnp.asarray(prompts[i : i + batch])
        out = L.generate(params, pb, ANS_LEN, cfg, interpret=interpret)
        preds.extend(decode_ids(row[:3]) for row in np.asarray(out))
    acc = float(np.mean([p == a for p, a in zip(preds, answers)]))
    return acc, preds
