"""LLM model: quantized prefill+decode must track the exact-path model."""

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import llm


def _setup():
    cfg = llm.tiny_llm_config(max_seq=64)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    return cfg, params, prompt


def test_prefill_logits_match_exact():
    cfg, params, prompt = _setup()
    lo_q, _ = llm.llm_prefill(params, prompt, cfg, attn_impl="int8")
    lo_e, _ = llm.llm_prefill(params, prompt, cfg, attn_impl="exact")
    # top-1 agreement on next-token prediction
    agree = (jnp.argmax(lo_q[:, -1], -1) == jnp.argmax(lo_e[:, -1], -1)).mean()
    assert float(agree) == 1.0


def test_decode_step_matches_prefill():
    """Decoding token s+1 via the cache must match prefilling s+1 tokens."""
    cfg, params, prompt = _setup()
    logits, caches = llm.llm_prefill(params, prompt, cfg, attn_impl="exact")
    nxt = jnp.argmax(logits[:, -1], -1)
    lo_dec, _ = llm.llm_decode_step(params, nxt, caches, cfg)
    full = jnp.concatenate([prompt, nxt[:, None]], axis=1)
    lo_full, _ = llm.llm_prefill(params, full, cfg, attn_impl="exact")
    # logits from the quantized decode path vs exact full prefill
    cos = jnp.sum(lo_dec * lo_full[:, -1]) / (
        jnp.linalg.norm(lo_dec) * jnp.linalg.norm(lo_full[:, -1])
    )
    assert float(cos) > 0.999


def test_generate_runs():
    cfg, params, prompt = _setup()
    out = llm.generate(params, prompt, 4, cfg)
    assert out.shape == (2, 4)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < cfg.vocab).all()


def test_generate_int4_cache():
    """End-to-end generation with the quarter-size int4 KV cache."""
    cfg = llm.tiny_llm_config(max_seq=64, kv_bits=4)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    toks = llm.generate(params, prompt, 4, cfg)
    assert toks.shape == (2, 4)
    # int4 cache stays close to the int8-cache generation path
    cfg8 = llm.tiny_llm_config(max_seq=64, kv_bits=8)
    toks8 = llm.generate(params, prompt, 4, cfg8)
    assert float((toks == toks8).mean()) >= 0.75


def test_quantized_weights_track_dense():
    """Per-channel packed weights (fused gemv path) track the dense model."""
    cfg, params, prompt = _setup()
    lo_d, _ = llm.llm_prefill(params, prompt, cfg, attn_impl="exact")
    # per-channel int4 is the coarse/fast point (grouped gemv is the
    # accuracy point); logits cos ~0.95 through this depth-2 model.
    for bits, thresh in ((8, 0.999), (4, 0.93)):
        qp = llm.quantize_llm_params(params, bits=bits)
        lo_q, caches = llm.llm_prefill(qp, prompt, cfg, attn_impl="exact")
        cos = jnp.sum(lo_q * lo_d) / (jnp.linalg.norm(lo_q) * jnp.linalg.norm(lo_d))
        assert float(cos) > thresh, (bits, float(cos))
        # decode step runs through the packed weights too
        nxt = jnp.argmax(lo_q[:, -1], -1)
        lo_dec, _ = llm.llm_decode_step(qp, nxt, caches, cfg)
        assert lo_dec.shape == (2, cfg.vocab)
        assert not bool(jnp.any(jnp.isnan(lo_dec)))


def test_prefill_native_transposed_matches_int8():
    cfg = llm.tiny_llm_config(max_seq=64, num_heads=4, num_kv_heads=2)
    assert cfg.head_dim == 64
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    lo_t, caches_t = llm.llm_prefill(params, prompt, cfg, attn_impl="int8_t")
    lo_q, _ = llm.llm_prefill(params, prompt, cfg, attn_impl="int8")
    # Same attention math; the wo contraction runs as one (h,d) dot_general
    # instead of flat reshape @ w — identical up to f32 accumulation order.
    np.testing.assert_allclose(np.asarray(lo_t), np.asarray(lo_q), rtol=5e-3, atol=2e-3)
    lo_e, _ = llm.llm_prefill(params, prompt, cfg, attn_impl="exact")
    agree = (jnp.argmax(lo_t[:, -1], -1) == jnp.argmax(lo_e[:, -1], -1)).mean()
    assert float(agree) == 1.0


def test_decode_tokens_matches_host_loop():
    """The scanned decode segment is bit-identical to the per-step host loop."""
    cfg, params, prompt = _setup()
    logits, caches = llm.llm_prefill(params, prompt, cfg)
    tok = jnp.argmax(logits[:, -1], -1)
    toks_scan, _ = llm.decode_tokens(params, tok, caches, 5, cfg)
    t, cs = tok, caches
    loop = []
    for _ in range(5):
        lo, cs = llm.llm_decode_step(params, t, cs, cfg)
        t = jnp.argmax(lo, -1)
        loop.append(t)
    np.testing.assert_array_equal(np.asarray(toks_scan), np.stack([np.asarray(x) for x in loop], 1))


def test_generate_bf16_cache_baseline():
    """kv_bits=16 (unquantized bf16 cache) is the decode-bench baseline mode."""
    cfg = llm.tiny_llm_config(max_seq=64, kv_bits=16)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    toks16 = llm.generate(params, prompt, 4, cfg)
    toks8 = llm.generate(params, prompt, 4, llm.tiny_llm_config(max_seq=64, kv_bits=8))
    assert toks16.shape == (2, 4)
    assert float((toks16 == toks8).mean()) >= 0.75


def test_generate_k4v8_cache():
    """Mixed-precision k4v8 cache (the measured 128K latency+memory winner)."""
    cfg = llm.tiny_llm_config(max_seq=64, kv_bits=8, k_bits=4)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    toks = llm.generate(params, prompt, 4, cfg)
    assert toks.shape == (2, 4)
    toks8 = llm.generate(params, prompt, 4, llm.tiny_llm_config(max_seq=64))
    assert float((toks == toks8).mean()) >= 0.75


def test_chunked_prefill_matches_one_shot():
    """Bounded-memory chunked prefill: identical cache rows, logits cos >
    0.999 vs the one-shot prefill, and the decode continuation agrees."""
    for kv_bits, k_bits in ((8, None), (16, None), (8, 4)):
        cfg = llm.tiny_llm_config(max_seq=96, kv_bits=kv_bits, k_bits=k_bits)
        params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 40), 0, cfg.vocab)
        lo_full, caches_full = llm.llm_prefill(params, prompt, cfg)
        lo_c, caches_c = llm.llm_prefill_chunked(params, prompt, cfg, chunk=16)
        # cache VALUES track the one-shot prefill's (upstream activations
        # differ slightly — the attention-path quantization differs — so
        # compare dequantized rows by cosine, not code equality)
        for cf, cc in zip(caches_full, caches_c):
            assert int(cc["length"][0]) == 40
            kf = np.asarray(
                llm._dequant_cache_rows(
                    cf["k"][:, :, :40], cf["k_scale"][:, :, :40],
                    cfg.eff_k_bits, jnp.float32),
                np.float32).ravel()
            kc = np.asarray(
                llm._dequant_cache_rows(
                    cc["k"][:, :, :40], cc["k_scale"][:, :, :40],
                    cfg.eff_k_bits, jnp.float32),
                np.float32).ravel()
            cosk = kf @ kc / (np.linalg.norm(kf) * np.linalg.norm(kc))
            thresh = 0.99 if cfg.eff_k_bits == 4 else 0.999
            assert cosk > thresh, (kv_bits, k_bits, cosk)
        a = np.asarray(lo_full[:, -1], np.float32).ravel()
        bb = np.asarray(lo_c, np.float32).ravel()
        cos = float(a @ bb / (np.linalg.norm(a) * np.linalg.norm(bb)))
        assert cos > (0.995 if cfg.eff_k_bits == 4 else 0.999), (kv_bits, k_bits, cos)
        # decode continues identically from either cache (greedy, 4 steps)
        t_full = jnp.argmax(lo_full[:, -1], -1)
        t_c = jnp.argmax(lo_c, -1)
        toks_full, _ = llm.decode_tokens(params, t_full, caches_full, 4, cfg)
        toks_c, _ = llm.decode_tokens(params, t_c, caches_c, 4, cfg)
        assert float((toks_full == toks_c).mean()) >= 0.75
