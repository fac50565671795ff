"""Speculative decoding: multi-token verify kernel + draft/verify loop.

The verify step rides the decode kernel's sublane row dim (ops/decode.py
``q_tokens``), so scoring K draft tokens streams the quantized cache ONCE.
Greedy speculative decoding must reproduce the target model's greedy output
exactly. Beyond the reference (no speculative decoding anywhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.models import llm
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def test_multitoken_decode_vs_oracle():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    b, h, hk, s, d, t = 2, 8, 2, 512, 64, 4
    q = jax.random.normal(ks[0], (b, t, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array([512, 300], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    o = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc, block_kv=128)
    assert o.shape == (b, t, h, d)
    for i in range(b):
        for tt in range(t):
            L = int(lengths[i]) - (t - 1 - tt)
            ref = attention_reference(
                q[i : i + 1, tt].reshape(1, h, 1, d),
                k[i : i + 1, :, :L],
                v[i : i + 1, :, :L],
            )
            c = float(cosine_similarity(o[i, tt][None, :, None, :], ref))
            assert c > 0.999, (i, tt, c)


def test_multitoken_matches_single_token_rows():
    """Each multi-token row must match the single-token kernel run at the
    same cache length — the exactness speculative decoding rests on."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    b, h, hk, s, d, t = 1, 4, 2, 256, 64, 3
    q = jax.random.normal(ks[0], (b, t, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    lengths = jnp.array([256], jnp.int32)
    multi = dec.decode_attention(
        q, kc, vc, ksc, lengths, v_scale=vsc, block_kv=128
    )
    for tt in range(t):
        single = dec.decode_attention(
            q[:, tt], kc, vc, ksc, lengths - (t - 1 - tt),
            v_scale=vsc, block_kv=128,
        )
        np.testing.assert_allclose(
            np.asarray(multi[:, tt]), np.asarray(single), rtol=0, atol=1e-5
        )


def test_multitoken_decode_paged():
    """q_tokens composes with paged tables (the serving-cache layout)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    b, h, hk, s, d, t, page = 2, 4, 2, 512, 64, 3, 128
    q = jax.random.normal(ks[0], (b, t, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array([512, 384], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    n_log = s // page
    perm = np.random.RandomState(1).permutation(b * n_log)
    table = perm.reshape(b, n_log).astype(np.int32)
    kp = np.zeros((hk, b * n_log, page, d), np.int8)
    vp = np.zeros((hk, b * n_log, page, d), np.int8)
    ksp = np.zeros((hk, b * n_log, page), np.float32)
    vsp = np.zeros((hk, b * n_log, page), np.float32)
    for i in range(b):
        for p in range(n_log):
            pid = table[i, p]
            rows = slice(p * page, (p + 1) * page)
            kp[:, pid] = np.asarray(kc)[i, :, rows]
            vp[:, pid] = np.asarray(vc)[i, :, rows]
            ksp[:, pid] = np.asarray(ksc)[i, :, rows]
            vsp[:, pid] = np.asarray(vsc)[i, :, rows]
    o = dec.decode_attention(
        q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(ksp), lengths,
        v_scale=jnp.asarray(vsp), page_table=jnp.asarray(table),
    )
    for i in range(b):
        for tt in range(t):
            L = int(lengths[i]) - (t - 1 - tt)
            ref = attention_reference(
                q[i : i + 1, tt].reshape(1, h, 1, d),
                k[i : i + 1, :, :L], v[i : i + 1, :, :L],
            )
            c = float(cosine_similarity(o[i, tt][None, :, None, :], ref))
            assert c > 0.999, (i, tt, c)


@pytest.fixture()
def target_setup():
    cfg = llm.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2, max_seq=128
    )
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab)
    return cfg, params, prompt


def test_verify_step_matches_decode_steps(target_setup):
    """Verify-step logits row t == the t-th sequential decode step."""
    cfg, params, prompt = target_setup
    _, caches_a = llm.llm_prefill(params, prompt, cfg)
    _, caches_b = llm.llm_prefill(params, prompt, cfg)
    toks = jnp.asarray([[7, 21, 3]], jnp.int32)
    vlog, _ = llm.llm_verify_step(params, toks, caches_a, cfg)
    for t in range(3):
        slog, caches_b = llm.llm_decode_step(params, toks[:, t], caches_b, cfg)
        cos = float(cosine_similarity(vlog[:, t], slog))
        assert cos > 0.99999, (t, cos)
        assert jnp.argmax(vlog[0, t]) == jnp.argmax(slog[0]), t


def test_speculative_equals_greedy_distinct_draft(target_setup):
    """Greedy spec decode == vanilla greedy, with an unrelated draft model
    (low acceptance — correctness must not depend on agreement)."""
    cfg, params, prompt = target_setup
    draft_cfg = llm.tiny_llm_config(
        vocab=64, dim=32, depth=1, num_heads=2, num_kv_heads=1, max_seq=128
    )
    draft_params = llm.init_llm_params(jax.random.PRNGKey(9), draft_cfg)
    ref = llm.generate(params, prompt, 10, cfg)
    got, stats = llm.speculative_generate(
        params, prompt, 10, cfg,
        draft_params=draft_params, draft_cfg=draft_cfg, spec_k=3,
        return_stats=True,
    )
    assert list(np.asarray(got[0])) == list(np.asarray(ref[0]))
    assert stats["rounds"] >= 1


def test_speculative_self_draft_accepts_everything(target_setup):
    """Draft == target: every draft token must be accepted (mean accepted
    == spec_k) and the output still equals greedy."""
    cfg, params, prompt = target_setup
    ref = llm.generate(params, prompt, 9, cfg)
    got, stats = llm.speculative_generate(
        params, prompt, 9, cfg,
        draft_params=params, draft_cfg=cfg, spec_k=4, return_stats=True,
    )
    assert list(np.asarray(got[0])) == list(np.asarray(ref[0]))
    assert stats["mean_accepted"] == stats["spec_k"]


def _engine_tokens(cfg, params, prompts, max_new, **scfg_kw):
    from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine

    eng = ServingEngine(
        params, cfg,
        ServingConfig(page_size=8, num_pages=32, max_batch=2, **scfg_kw),
    )
    rids = [eng.add_request(p, max_new) for p in prompts]
    done = eng.run()
    return [done[r] for r in rids], eng


def test_serving_ngram_spec_matches_plain():
    """N-gram speculative serving emits EXACTLY the plain engine's greedy
    tokens (single and batched), and actually accepts drafts on repetitive
    histories (>1 token per verify round)."""
    cfg = llm.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2, max_seq=256
    )
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    # repetitive prompt: n-gram lookup has something to match, and random-
    # weight greedy generation tends to settle into cycles (accept fuel)
    prompts = [[5, 9, 3, 5, 9, 3, 5, 9, 3, 7], [11, 2, 11, 2, 11, 2, 4]]
    plain, _ = _engine_tokens(cfg, params, prompts, 20)
    spec, eng = _engine_tokens(
        cfg, params, prompts, 20, spec_ngram=2, spec_k=4
    )
    assert spec == plain
    st = eng.stats()
    assert st["spec_rounds"] >= 1
    # every round emits >= 1 token by construction; drafts being ACCEPTED
    # is what pushes the mean strictly above 1
    assert st["spec_tokens_per_round"] > 1.0
    assert st["free_pages"] + st.get("cached_pages", 0) == st["num_pages"]


def test_serving_ngram_spec_with_window():
    """Speculation composes with the sliding window + rolling reclamation."""
    cfg = llm.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2,
        max_seq=256, window_size=12, sink_size=4,
    )
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompts = [[5, 9, 3, 5, 9, 3, 5, 9, 3, 7]]
    plain, _ = _engine_tokens(cfg, params, prompts, 24)
    spec, eng = _engine_tokens(
        cfg, params, prompts, 24, spec_ngram=2, spec_k=3
    )
    assert spec == plain
    assert eng.stats()["spec_rounds"] >= 1


@pytest.fixture(params=["native", "fallback"])
def sched_cls(request, monkeypatch):
    import lowbit_quant_fa2_paddle_tpu.host as host_mod
    from lowbit_quant_fa2_paddle_tpu.host import Scheduler

    if request.param == "native":
        if not host_mod.HAVE_NATIVE:
            pytest.skip("native extension not built")
    else:
        monkeypatch.setattr(host_mod, "_native", None)
    return Scheduler


def test_scheduler_rollback(sched_cls):
    """Speculative rejection primitive: length shrinks, pages stay, range
    errors raise — native and fallback agree."""
    s = sched_cls(8, 4, 2)
    rid = s.add(6, 6)
    s.step()
    for _ in range(3):
        s.append_token(rid)  # length 9, 3 pages
    n_pages = len(s.page_table(rid))
    assert s.rollback(rid, 2) == 7
    assert len(s.page_table(rid)) == n_pages  # pages stay for re-append
    assert s.info(rid)["length"] == 7
    assert s.append_token(rid) == 8  # re-append reuses the grown pages
    with pytest.raises(ValueError):
        s.rollback(rid, 8)  # >= length
    with pytest.raises(ValueError):
        s.rollback(rid, -1)
    with pytest.raises(ValueError):
        s.rollback(rid + 1, 1)  # not running
    s.release(rid)
    assert s.stats()["free_pages"] == 8


def test_ngram_index_matches_scan():
    """The incremental n-gram index reproduces a brute-force scan."""
    from lowbit_quant_fa2_paddle_tpu.serving import _NgramIndex

    rng = np.random.RandomState(0)
    toks = [int(x) for x in rng.randint(0, 5, size=200)]
    for n in (1, 2, 3):
        idx = _NgramIndex(n)
        for i, t in enumerate(toks):
            idx.extend([t])
            hist = toks[: i + 1]
            # brute force: most recent previous occurrence of the suffix
            want = []
            if len(hist) >= n + 1:
                key = hist[-n:]
                for s in range(len(hist) - n - 1, -1, -1):
                    if hist[s : s + n] == key:
                        want = hist[s + n : s + n + 3]
                        break
            assert idx.draft(3) == want, (n, i)


def test_serving_spec_requires_reserve():
    from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine

    cfg = llm.tiny_llm_config(vocab=64, dim=64, depth=1, num_heads=2,
                              num_kv_heads=1, max_seq=64)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        ServingEngine(params, cfg, ServingConfig(
            page_size=8, num_pages=16, max_batch=1,
            spec_ngram=2, admission="lazy",
        ))


def test_speculative_int4_self_draft(target_setup):
    """Self-speculation: the SAME weights drafting through an int4 KV cache
    (quarter-size draft stream); exactness still holds."""
    cfg, params, prompt = target_setup
    draft_cfg = llm.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2,
        max_seq=128, kv_bits=4,
    )
    ref = llm.generate(params, prompt, 8, cfg)
    got = llm.speculative_generate(
        params, prompt, 8, cfg,
        draft_params=params, draft_cfg=draft_cfg, spec_k=3,
    )
    assert list(np.asarray(got[0])) == list(np.asarray(ref[0]))
