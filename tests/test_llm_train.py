"""Toy-LLM training path (models/train.py): the data format, the training
loop (loss drops), and the trained-ladder plumbing — the in-repo stand-in
for the reference's inferenceKit-grades-a-real-model capability
(reference src/triton/utils/inferenceKit/inference.py:1-136)."""

import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.models import train as T


def test_fact_format_fixed_shape():
    assert T.fact(7, 42) == "07+42=049;"
    assert len(T.fact(99, 99)) == T.FACT_LEN
    assert T.encode("09+=;") == [0, 9, 10, 11, 12]
    assert T.decode_ids(T.encode("12+34=046;")) == "12+34=046;"


def test_arith_stream_batch_aligned():
    rng = np.random.RandomState(0)
    toks = T.arith_stream_batch(rng, 4, 31)
    assert toks.shape == (4, 32)
    for row in toks:
        s = T.decode_ids(row)
        assert s[2] == "+" and s[5] == "=" and s[9] == ";"  # fact-aligned
        assert len(s) == 32


def test_eval_prompts_end_in_question():
    prompts, answers = T.make_eval_prompts(6, few_shot=2)
    assert prompts.shape == (6, 2 * T.FACT_LEN + T.Q_LEN)
    for p, a in zip(prompts, answers):
        s = T.decode_ids(p)
        assert s.endswith("=") and s[-T.Q_LEN - 1] == ";"
        q = s[-T.Q_LEN:]
        assert int(q[0:2]) + int(q[3:5]) == int(a)
    # held-out questions must be graded by exact digit match
    assert T.grade_answer(T.encode(answers[0] + ";"), answers[0])
    assert not T.grade_answer(T.encode("000;"), "001")


def test_training_reduces_loss_and_learns_format():
    cfg = T.arith_llm_config(dim=64, depth=2, num_heads=4, num_kv_heads=2)
    params, losses = T.train_toy_llm(
        cfg, steps=150, batch=32, seq_len=31, scan_chunk=50, lr=2e-3
    )
    assert losses[-1] < losses[0] * 0.8, losses
    # 150 steps can't solve addition, but the FORMAT (3 digits + ';') is
    # learned — i.e. logits already carry real margins on structure tokens
    prompts, answers = T.make_eval_prompts(8, few_shot=2)
    _, preds = T.eval_accuracy(params, cfg, prompts, answers, batch=8)
    assert all(len(p) == 3 and p.isdigit() for p in preds), preds


def test_checkpoint_roundtrip(tmp_path):
    from lowbit_quant_fa2_paddle_tpu.models import llm as L
    from lowbit_quant_fa2_paddle_tpu.utils.checkpoint import (
        load_params,
        save_params,
    )

    cfg = T.arith_llm_config(dim=32, depth=1, num_heads=2, num_kv_heads=1)
    params = L.init_llm_params(__import__("jax").random.PRNGKey(3), cfg)
    save_params(str(tmp_path / "p.npz"), params)
    back = load_params(str(tmp_path / "p.npz"), params)
    flat1 = __import__("jax").tree_util.tree_leaves(params)
    flat2 = __import__("jax").tree_util.tree_leaves(back)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
