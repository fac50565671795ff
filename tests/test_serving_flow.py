"""Serving-flow integration: PageAllocator (native C++) -> paged int8 KV
pool -> page-table decode kernel. The end-to-end shape of a paged-attention
serving runtime (the role the external sglang/vLLM stack plays around the
reference's decode kernel)."""

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu import host
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def test_allocator_driven_paged_decode():
    hk, d, page = 2, 64, 256
    n_pool_pages = 16
    alloc = host.PageAllocator(n_pool_pages)

    # two sequences of different lengths share one physical pool
    lens = [512, 256]
    h = 8
    key = jax.random.PRNGKey(0)
    k_pool = np.zeros((hk, n_pool_pages, page, d), np.int8)
    v_pool = np.zeros((hk, n_pool_pages, page, d), np.int8)
    ks_pool = np.ones((hk, n_pool_pages, page), np.float32)
    vs_pool = np.ones((hk, n_pool_pages, page), np.float32)
    kv_dense = []
    max_pages = max(L // page for L in lens)
    table = np.zeros((len(lens), max_pages), np.int32)

    for b, L in enumerate(lens):
        sid = alloc.new_seq()
        kk = jax.random.fold_in(key, b)
        k = jax.random.normal(kk, (1, hk, L, d))
        v = jax.random.normal(jax.random.fold_in(kk, 1), (1, hk, L, d))
        kv_dense.append((k, v))
        kc, ksc = quant_int8(k, gran="per_token")
        vc, vsc = quant_int8(v, gran="per_token")
        for pi in range(L // page):
            phys = alloc.append_page(sid)
            table[b, pi] = phys
            sl = slice(pi * page, (pi + 1) * page)
            k_pool[:, phys] = np.asarray(kc)[0, :, sl]
            v_pool[:, phys] = np.asarray(vc)[0, :, sl]
            ks_pool[:, phys] = np.asarray(ksc)[0, :, sl]
            vs_pool[:, phys] = np.asarray(vsc)[0, :, sl]

    assert alloc.stats()["free_pages"] == n_pool_pages - 3  # 2 + 1 pages used

    q = jax.random.normal(jax.random.fold_in(key, 99), (len(lens), h, d))
    o = dec.decode_attention(
        q,
        jnp.asarray(k_pool),
        jnp.asarray(v_pool),
        jnp.asarray(ks_pool),
        jnp.asarray(lens, dtype=jnp.int32),
        v_scale=jnp.asarray(vs_pool),
        page_table=jnp.asarray(table),
        block_kv=page,
    )
    for b, (k, v) in enumerate(kv_dense):
        o_ref = attention_reference(q[b : b + 1].reshape(1, h, 1, d), k, v)[:, :, 0]
        cos = float(metrics.cosine_similarity(o[b : b + 1], o_ref))
        assert cos > 0.999, (b, cos)

    # free a sequence; its pages return to the pool
    alloc.free_seq(0)
    assert alloc.stats()["free_pages"] == n_pool_pages - 1


def test_multi_step_segments_token_identical():
    """multi_step=N (scanned decode segments) must emit exactly the
    single-step engine's tokens, retire on budget, and count segments."""
    import jax
    import jax.numpy as jnp

    from lowbit_quant_fa2_paddle_tpu import serving
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.LLMConfig(vocab=64, dim=64, depth=1, num_heads=2,
                        num_kv_heads=1, max_seq=128)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 3, 3, 3]]
    outs = {}
    for ms in (1, 4):
        eng = serving.ServingEngine(
            params, cfg,
            serving.ServingConfig(page_size=8, num_pages=24, max_batch=2,
                                  multi_step=ms, prefix_caching=False),
        )
        rids = [eng.add_request(p, 11) for p in prompts]
        done = eng.run()
        outs[ms] = [done[r] for r in rids]
        if ms > 1:
            assert eng.multi_segments > 0
            assert all(len(t) == 11 for t in outs[ms])
    assert outs[1] == outs[4]


def test_multi_step_with_standing_queue_token_identical():
    """With more requests than slots, segments engage once the queue
    drains (the gate keeps single ticks while admission is possible —
    measured occupancy tradeoff, PERFORMANCE.md) and the stream still
    matches the single-step engine."""
    import jax

    from lowbit_quant_fa2_paddle_tpu import serving
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.LLMConfig(vocab=64, dim=64, depth=1, num_heads=2,
                        num_kv_heads=1, max_seq=128)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]  # 5 reqs, 2 slots
    outs = {}
    segs = 0
    for ms in (1, 4):
        eng = serving.ServingEngine(
            params, cfg,
            serving.ServingConfig(page_size=8, num_pages=16, max_batch=2,
                                  multi_step=ms, prefix_caching=False),
        )
        rids = [eng.add_request(p, 9) for p in prompts]
        done = eng.run()
        outs[ms] = [done[r] for r in rids]
        segs = eng.multi_segments
    assert outs[1] == outs[4]
    assert segs > 0  # segments engaged after the queue drained


def test_eos_token_stops_on_every_path():
    """eos_token stops generation early (eos included in the output) on the
    single-step, multi-step, and speculative engines — and the pre-eos
    stream matches the no-eos engine's."""
    import jax

    from lowbit_quant_fa2_paddle_tpu import serving
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.LLMConfig(vocab=64, dim=64, depth=1, num_heads=2,
                        num_kv_heads=1, max_seq=128)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    def run(scfg_kw, eos):
        eng = serving.ServingEngine(
            params, cfg,
            serving.ServingConfig(page_size=8, num_pages=24, max_batch=2,
                                  prefix_caching=False, **scfg_kw),
        )
        rids = [eng.add_request(p, 16, eos_token=eos) for p in prompts]
        done = eng.run()
        return [done[r] for r in rids]

    base = run({}, None)
    # pick an eos that actually occurs mid-stream in the baseline
    eos = None
    for stream in base:
        for t in stream[:-1]:
            eos = int(t)
            break
        if eos is not None:
            break
    assert eos is not None
    for kw in ({}, {"multi_step": 4}, {"spec_ngram": 2, "spec_k": 3}):
        outs = run(kw, eos)
        for full, stopped in zip(base, outs):
            if eos in full:
                cut = full.index(eos) + 1
                assert stopped == full[:cut], (kw, full, stopped)
            else:
                assert stopped == full, (kw, full, stopped)


def test_async_fetch_token_identical():
    """async_fetch (device-resident tokens, values fetched only at
    retirement) emits exactly the synchronous engine's tokens, including
    with a standing queue and mid-flight admissions."""
    import jax

    from lowbit_quant_fa2_paddle_tpu import serving
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.LLMConfig(vocab=64, dim=64, depth=1, num_heads=2,
                        num_kv_heads=1, max_seq=128)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]  # 5 reqs, 2 slots
    outs = {}
    for mode in (False, True):
        eng = serving.ServingEngine(
            params, cfg,
            serving.ServingConfig(page_size=8, num_pages=16, max_batch=2,
                                  async_fetch=mode, prefix_caching=False),
        )
        rids = [eng.add_request(p, 9) for p in prompts]
        done = eng.run()
        outs[mode] = [done[r] for r in rids]
        assert all(len(t) == 9 for t in outs[mode])
    assert outs[False] == outs[True]
