"""Eval kit: config precedence, datasets, grading, resume-safe inference."""

import json
import os

import pytest

from lowbit_quant_fa2_paddle_tpu.evalkit import (
    InferenceConfig,
    extract_answer,
    grade_numeric,
    load_dataset,
    run_inference,
)


def test_config_precedence(tmp_path):
    cf = tmp_path / "cfg.json"
    cf.write_text(json.dumps({"batch_size": 2, "model": "from_file", "custom": 1}))
    cfg = InferenceConfig.resolve(
        config_file=str(cf),
        model_args={"model": "from_model", "attn_impl": "int4"},
        command_args={"model": "from_cmd"},
        runtime_args={"batch_size": 16},
    )
    assert cfg.model == "from_cmd"       # command > model > file
    assert cfg.batch_size == 16          # runtime > file
    assert cfg.attn_impl == "int4"
    assert cfg.extra["custom"] == 1


def test_datasets():
    ds = load_dataset("simple", n=5)
    assert len(ds) == 5 and "####" in ds[0]["answer"]
    with pytest.raises(KeyError):
        load_dataset("nope")


def test_math_dataset(tmp_path):
    """MATH loader (reference inferenceKit/dataset/mathdataset.py role):
    bundled sample + problem/solution JSONL normalization, feeding the
    grader's \\boxed{} rung."""
    ds = load_dataset("math")
    assert len(ds) == 5
    for ex in ds:
        ans = extract_answer(ex["answer"])
        assert ans is not None  # every sample answers through \boxed{}
        assert grade_numeric(ans, ans)
    assert extract_answer(ds[0]["answer"]) == "42"
    assert load_dataset("math", limit=2) == ds[:2]
    # MATH dump schema (problem/solution) normalizes to question/answer
    p = tmp_path / "math.jsonl"
    p.write_text('{"problem": "1+1?", "solution": "\\\\boxed{2}"}\n')
    rows = load_dataset("math", path=str(p))
    assert rows == [{"question": "1+1?", "answer": "\\boxed{2}"}]
    assert extract_answer(rows[0]["answer"]) == "2"


@pytest.mark.parametrize(
    "text,expected",
    [
        ("The answer is #### 42", "42"),
        ("thus \\boxed{3.5} holds", "3.5"),
        ("we get 7 then 12 finally 19.", "19"),
        ("no numbers here", None),
    ],
)
def test_extract_answer(text, expected):
    assert extract_answer(text) == expected


def test_grade_numeric():
    assert grade_numeric("42", "42.0")
    assert grade_numeric("1,000", "1000")
    assert not grade_numeric("41", "42")
    assert not grade_numeric(None, "42")


def test_math_equal_ladder():
    """The full equivalence ladder (reference grader.py math_equal)."""
    from lowbit_quant_fa2_paddle_tpu.evalkit.grader import (
        clean_choice_answer,
        math_equal,
    )

    # exact / case-insensitive
    assert math_equal("Yes", "yes")
    # multiple choice: last standalone letter wins
    assert clean_choice_answer("The answer is B. Wait, actually D.") == "D"
    assert math_equal("so the answer is (C)", "C")
    assert not math_equal("so the answer is (C)", "D")
    # percent tolerance both ways
    assert math_equal("50%", "0.5")
    assert math_equal("0.5", "50")
    assert math_equal("$1,234", "1234")
    # LaTeX fractions (the reference's own self-test: \frac1{6} == 1/6)
    assert math_equal("1/6", "\\frac1{6}")
    assert math_equal("\\frac{3}{4}", "0.75")
    # unordered comma lists, polar coordinates stay ordered
    assert math_equal("3, 1, 2", "1, 2, 3")
    assert not math_equal("(2, pi)", "(pi, 2)")
    # elementwise tuples
    assert math_equal("(0.5, 2)", "(1/2, 2.0)")
    # matrices
    assert math_equal(
        "\\begin{pmatrix}1 & 2\\\\3 & 4\\end{pmatrix}",
        "\\begin{pmatrix}1.0 & 2\\\\3 & 4.0\\end{pmatrix}",
    )
    assert not math_equal(
        "\\begin{pmatrix}1 & 2\\\\3 & 4\\end{pmatrix}",
        "\\begin{pmatrix}1 & 2\\\\3 & 5\\end{pmatrix}",
    )
    # mismatches stay mismatches
    assert not math_equal("41", "42")
    assert not math_equal(None, "42")


def test_math_equal_symbolic():
    from lowbit_quant_fa2_paddle_tpu.evalkit.grader import HAVE_SYMPY, math_equal

    if not HAVE_SYMPY:
        pytest.skip("sympy not in image")
    assert math_equal("x + x", "2*x")
    assert math_equal("y = 2*x", "2*x = y")
    # timeout-guarded path returns (it must never hang the eval loop)
    assert math_equal("x + x", "2*x", check_timeout=True)


def test_run_inference_with_resume(tmp_path):
    cfg = InferenceConfig(
        dataset="simple", batch_size=4, output_dir=str(tmp_path),
        extra={"dataset_args": {"n": 8, "seed": 1}},
    )
    examples = load_dataset("simple", n=8, seed=1)

    calls = {"n": 0}

    def oracle_gen(questions, cfg):
        calls["n"] += 1
        if calls["n"] == 2 and not os.path.exists(tmp_path / "crashed"):
            (tmp_path / "crashed").touch()
            raise RuntimeError("simulated crash")
        outs = []
        for q in questions:
            a, b = [int(t) for t in q.replace("?", "").split() if t.isdigit()]
            outs.append(f"answer: #### {a + b}")
        return outs

    with pytest.raises(RuntimeError):
        run_inference(cfg, oracle_gen, examples)
    # partial results persisted
    assert any(f.startswith("RESUME_") for f in os.listdir(tmp_path))
    summary = run_inference(cfg, oracle_gen, examples)  # resumes cleanly
    assert summary["n"] == 8
    assert summary["accuracy"] == 1.0
    assert not any(f.startswith("RESUME_") for f in os.listdir(tmp_path))
    assert os.path.exists(tmp_path / "result.json")


def test_end_to_end_with_llm():
    """Wire the kit to the in-repo LLM (untrained — just checks plumbing)."""
    import jax
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg_m = llm.tiny_llm_config(max_seq=64, vocab=64, dim=64, num_heads=4, num_kv_heads=2)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg_m)

    def gen(questions, cfg):
        import jax.numpy as jnp

        toks = jnp.array(
            [[min(ord(c), 63) for c in q[:8].ljust(8)] for q in questions]
        )
        out = llm.generate(params, toks, 4, cfg_m)
        return [" ".join(str(int(t)) for t in row) for row in out]

    cfg = InferenceConfig(dataset="simple", batch_size=4, resume=False,
                          output_dir="/tmp/lowbit_evalkit_test",
                          extra={"dataset_args": {"n": 4}})
    summary = run_inference(cfg, gen, None)
    assert summary["n"] == 4  # untrained model: accuracy not asserted


# -- perceptual scorers (the local VQA/CLIP/ITM stand-ins) -------------------


def test_perceptual_scorers():
    import numpy as np
    from lowbit_quant_fa2_paddle_tpu.evalkit import perceptual as P

    rng = np.random.default_rng(0)
    base = rng.standard_normal((3, 32, 32))
    # identity: perfect scores
    assert P.ssim(base, base) == pytest.approx(1.0)
    assert P.random_feature_distance(base, base) == pytest.approx(1.0)
    bands = P.freq_band_mse(base, base)
    assert all(v == 0.0 for v in bands.values())

    # mild vs heavy noise: every scorer must rank them correctly
    mild = base + 0.05 * rng.standard_normal(base.shape)
    heavy = base + 1.0 * rng.standard_normal(base.shape)
    assert 1.0 > P.ssim(mild, base) > P.ssim(heavy, base)
    assert 1.0 > P.random_feature_distance(mild, base) > P.random_feature_distance(heavy, base)
    assert P.freq_band_mse(mild, base)["high"] < P.freq_band_mse(heavy, base)["high"]

    # blur vs noise separate in frequency space: blur kills high band
    # CONTENT, not low; additive noise shows up in the high band error
    blur = 0.25 * (
        base
        + np.roll(base, 1, axis=-1)
        + np.roll(base, 1, axis=-2)
        + np.roll(np.roll(base, 1, axis=-1), 1, axis=-2)
    )
    b_blur = P.freq_band_mse(blur, base)
    assert b_blur["high"] > b_blur["low"]  # blur's error concentrates high

    # report shape used by eval_out/result.json
    rep = P.perceptual_report(mild, base)
    assert set(rep) == {"ssim", "feature_cos", "freq_mse_low", "freq_mse_mid", "freq_mse_high"}


def test_latent_to_frames_shapes():
    import numpy as np
    from lowbit_quant_fa2_paddle_tpu.evalkit import perceptual as P

    frames = P.latent_to_frames(np.zeros((2, 48, 16), np.float32))
    assert frames.shape == (8, 6, 8)  # 48 tokens -> 6x8 grid, 4 channel-frames
    frames = P.latent_to_frames(np.zeros((64, 8), np.float32))  # unbatched
    assert frames.shape == (4, 8, 8)
