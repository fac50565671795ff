"""Serving runtime: continuous-batching scheduler + engine.

The engine's correctness contract is *batching invariance*: a request's
generated tokens must be identical whether it runs alone or interleaved with
other requests (admission order, slot assignment, and page placement must
not leak into the math). The reference has no in-repo serving runtime (it
delegates to sglang, reference src/triton/utils/main.py:14-15).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lowbit_quant_fa2_paddle_tpu.host as host_mod
from lowbit_quant_fa2_paddle_tpu.host import Scheduler
from lowbit_quant_fa2_paddle_tpu.models import llm as L
from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine


@pytest.fixture(params=["native", "fallback"])
def sched_cls(request, monkeypatch):
    if request.param == "native":
        if not host_mod.HAVE_NATIVE:
            pytest.skip("native extension not built")
    else:
        monkeypatch.setattr(host_mod, "_native", None)
    return Scheduler


class TestScheduler:
    def test_fifo_admission_and_paging(self, sched_cls):
        s = sched_cls(8, 4, 2)
        r0 = s.add(6, 3)  # worst case ceil(8/4)=2 pages
        r1 = s.add(4, 5)  # 2 pages
        r2 = s.add(9, 4)  # 3 pages
        st = s.step()
        assert st["admitted"] == [r0, r1]
        assert st["waiting"] == 1  # r2 blocked: pool can't cover its reservation
        assert len(s.page_table(r0)) == 2
        assert s.info(r0)["length"] == 6
        # r0 grows 6 -> 9; a third page appears when crossing 8 -> 9
        assert s.append_token(r0) == 7
        assert s.append_token(r0) == 8
        assert len(s.page_table(r0)) == 2
        assert s.append_token(r0) == 9
        assert len(s.page_table(r0)) == 3
        s.release(r0)
        st = s.step()
        assert st["admitted"] == [r2]
        assert s.info(r2)["length"] == 9 and len(s.page_table(r2)) == 3
        s.release(r1)
        s.release(r2)
        assert s.stats()["free_pages"] == 8
        assert s.stats()["used_slots"] == 0

    def test_reservation_blocks_admission(self, sched_cls):
        # 4 pages of 2 tokens; one request reserving the whole pool blocks
        # the next even though prompt pages alone would fit both.
        s = sched_cls(4, 2, 2)
        r0 = s.add(2, 7)  # worst 8 tokens -> 4 pages
        r1 = s.add(2, 1)  # worst 2 tokens -> 1 page
        st = s.step()
        assert st["admitted"] == [r0]
        assert st["waiting"] == 1  # strict FIFO: r1 waits even though it fits? no —
        # r0 reserved all 4 pages (1 allocated, 3 outstanding): free-outstanding = 0 < 1
        # grow r0 to completion, release, then r1 admits
        for _ in range(6):
            s.append_token(r0)
        s.release(r0)
        assert s.step()["admitted"] == [r1]

    def test_never_fits_raises(self, sched_cls):
        s = sched_cls(2, 2, 1)
        with pytest.raises(MemoryError):
            s.add(4, 2)  # worst 5 tokens -> 3 pages > pool

    def test_slot_exhaustion(self, sched_cls):
        s = sched_cls(16, 2, 1)
        r0 = s.add(2, 2)
        r1 = s.add(2, 2)
        assert s.step()["admitted"] == [r0]
        assert s.step()["admitted"] == []  # no slot
        s.release(r0)
        assert s.step()["admitted"] == [r1]

    def test_cancel_waiting_unblocks_fifo(self, sched_cls):
        # an abandoned head request must not block strict-FIFO admission
        s = sched_cls(4, 2, 2)
        r0 = s.add(2, 7)  # worst 8 tokens -> 4 pages: takes the whole pool
        r1 = s.add(8, 1)  # 4 pages: can never admit behind r0
        r2 = s.add(2, 1)
        assert s.step()["admitted"] == [r0]
        assert s.step()["admitted"] == []  # r1 blocks the queue
        s.cancel(r1)
        assert s.info(r1)["canceled"]
        for _ in range(6):
            s.append_token(r0)
        s.release(r0)
        assert s.step()["admitted"] == [r2]
        with pytest.raises(ValueError):
            s.cancel(r2)  # running, not waiting

    def test_lazy_admission_and_preempt(self, sched_cls):
        # lazy: both requests admit even though worst-case needs collide
        s = sched_cls(4, 2, 2, lazy=True)
        r0 = s.add(2, 7)  # worst 4 pages
        r1 = s.add(2, 7)  # worst 4 pages
        st = s.step()
        assert st["admitted"] == [r0, r1]  # reserve policy would admit only r0
        # grow r0 until the pool is exhausted (r0: 3 pages, r1: 1 page)
        assert s.append_token(r0) == 3
        assert s.append_token(r0) == 4
        assert s.append_token(r0) == 5
        assert s.append_token(r0) == 6
        assert s.stats()["free_pages"] == 0
        assert s.append_token(r0) == -1  # page pressure, length NOT grown
        assert s.info(r0)["length"] == 6
        # preempt the younger r1; r0's growth proceeds
        s.preempt(r1)
        assert s.info(r1)["preempted"]
        assert s.append_token(r0) == 7
        s.release(r0)
        # r1 resumes from the front with its stored length intact
        st = s.step()
        assert st["admitted"] == [r1]
        assert s.info(r1)["length"] == 2 and not s.info(r1)["preempted"]
        assert s.append_token(r1) == 3
        s.release(r1)
        assert s.stats()["free_pages"] == 4


@pytest.fixture(scope="module")
def llm_setup():
    cfg = L.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2, max_seq=64
    )
    params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


PROMPTS = [
    ([5, 11, 3, 7, 2], 6),
    ([9, 1, 4, 20, 8, 13, 2, 6, 31], 4),
    ([40, 22, 17], 5),
]


def _solo_tokens(cfg, params, prompt, max_new):
    eng = ServingEngine(
        params, cfg, ServingConfig(page_size=8, num_pages=16, max_batch=2)
    )
    rid = eng.add_request(prompt, max_new)
    return eng.run()[rid]


class TestServingEngine:
    def test_batching_invariance(self, llm_setup):
        """Tokens from the batched engine == each request run alone."""
        cfg, params = llm_setup
        solo = [_solo_tokens(cfg, params, p, n) for p, n in PROMPTS]

        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=16, max_batch=2)
        )
        rids = [eng.add_request(p, n) for p, n in PROMPTS]
        done = eng.run()
        assert set(done) == set(rids)
        for rid, ref in zip(rids, solo):
            assert done[rid] == ref, (rid, done[rid], ref)
        st = eng.stats()
        # every page is either free or held by the prefix cache
        assert st["free_pages"] + st["cached_pages"] == st["num_pages"]
        assert st["used_slots"] == 0

    def test_late_arrival(self, llm_setup):
        """A request added mid-flight produces the same tokens."""
        cfg, params = llm_setup
        ref = _solo_tokens(cfg, params, *PROMPTS[2])
        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=16, max_batch=2)
        )
        eng.add_request(*PROMPTS[0])
        eng.step()
        eng.step()
        rid_late = eng.add_request(*PROMPTS[2])
        done = eng.run()
        assert done[rid_late] == ref

    def test_matches_contiguous_generate(self, llm_setup):
        """Engine output == models.llm.generate (contiguous-cache oracle)."""
        cfg, params = llm_setup
        prompt, max_new = PROMPTS[0]
        ref = L.generate(params, jnp.asarray([prompt]), max_new, cfg)
        got = _solo_tokens(cfg, params, prompt, max_new)
        assert got == list(np.asarray(ref[0])), (got, np.asarray(ref[0]))

    def test_queueing_beyond_slots(self, llm_setup):
        """5 requests through 2 slots / a small pool: all finish, all match."""
        cfg, params = llm_setup
        reqs = PROMPTS + [([3, 3, 3, 3], 3), ([60, 2], 7)]
        solo = [_solo_tokens(cfg, params, p, n) for p, n in reqs]
        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=8, max_batch=2)
        )
        rids = [eng.add_request(p, n) for p, n in reqs]
        done = eng.run()
        for rid, ref in zip(rids, solo):
            assert done[rid] == ref

    def test_prefix_cache_sharing(self, llm_setup):
        """Second request with the same long prompt shares pages, skips the
        shared prefill compute, and still generates sensible tokens."""
        cfg, params = llm_setup
        prompt = list(range(1, 21))  # 20 tokens = 2 full pages + 4 (page 8)
        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=32, max_batch=2)
        )
        r0 = eng.add_request(prompt, 4)
        eng.step()  # admits + prefills r0, registers its full pages
        assert eng.stats()["cached_pages"] == 2
        r1 = eng.add_request(prompt, 4)
        assert eng.sched.info(r1)["shared"] == 2
        done = eng.run()
        # identical prompts must generate identical tokens, shared or not
        assert done[r0] == done[r1], (done[r0], done[r1])
        assert eng.prefix_cache.hits >= 2  # r1 hit both full pages
        st = eng.stats()
        assert st["free_pages"] + st["cached_pages"] <= st["num_pages"]

    def test_prefix_cache_page_savings(self, llm_setup):
        """Three requests sharing a page-aligned system prompt allocate far
        fewer pages than three independent ones."""
        cfg, params = llm_setup
        sys_prompt = list(range(2, 18))  # 16 tokens = 2 full pages
        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=32, max_batch=1)
        )
        peak_used = 0
        rids = []
        for i in range(3):
            rids.append(eng.add_request(sys_prompt + [30 + i], 3))
        while len(eng.finished) < 3:
            eng.step()
            st = eng.stats()
            peak_used = max(peak_used, st["num_pages"] - st["free_pages"])
        # without sharing each request holds 3-4 pages while running plus the
        # 2-page cached prefix of earlier prompts; with sharing the prefix
        # pages are counted once
        assert eng.prefix_cache.hits >= 4  # requests 2 and 3 hit 2 pages each
        assert peak_used <= 6, peak_used
        # outputs identical across the three (same prompt + suffix token id
        # differs, so only assert they completed)
        assert all(len(eng.finished[r]) == 3 for r in rids)

    def test_chunked_prefill_accuracy(self, llm_setup):
        """Chunked prefill (cross over cached prefix + causal self, LSE
        merge) matches full prefill logits closely."""
        import numpy as np
        from lowbit_quant_fa2_paddle_tpu.serving import (
            _chunked_prefill_forward,
            _prefill_forward,
        )
        cfg, params = llm_setup
        prompt = np.arange(1, 25, dtype=np.int32)  # 24 tokens
        s_pre = 16
        full_logits, full_kv = _prefill_forward(
            params, jnp.asarray(prompt)[None], cfg, (8, 8), None
        )
        # build the prefix KV exactly as the cache stores it (per-token quant)
        prefix_kv = [
            (kq[:, :s_pre], ks[:, :s_pre], vq[:, :s_pre], vs[:, :s_pre])
            for (kq, ks, vq, vs) in full_kv
        ]
        ch_logits, ch_kv = _chunked_prefill_forward(
            params, jnp.asarray(prompt[s_pre:])[None], prefix_kv, s_pre, cfg,
            (8, 8), None
        )
        a = np.asarray(full_logits, np.float32)
        b = np.asarray(ch_logits, np.float32)
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.999, cos
        # suffix KV rows match the full prefill's rows for those positions
        for (fk, fks, fv, fvs), (ck, cks, cv, cvs) in zip(full_kv, ch_kv):
            fk_, fks_ = np.asarray(fk[:, s_pre:]), np.asarray(fks[:, s_pre:])
            err = np.abs(fk_.astype(np.int32) - np.asarray(ck, np.int32)).max()
            assert err <= 2, err  # residual-stream drift moves a few codes by 1-2

    def test_eviction_under_pressure(self, llm_setup):
        """A full cache gives way: new requests evict LRU pins and complete."""
        cfg, params = llm_setup
        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=8, max_batch=1)
        )
        r0 = eng.add_request(list(range(1, 18)), 3)  # 17 tokens: 2 full pages cached
        eng.run()
        assert eng.stats()["cached_pages"] == 2
        # this request needs 7 pages worst-case; pool has 8 with 2 pinned
        r1 = eng.add_request(list(range(40, 60)), 30)
        done = eng.run()
        assert len(done[r1]) == 30
        assert len(eng.finished[r0]) == 3

    def test_lazy_preemption_invariance(self, llm_setup):
        """Lazy admission with a tight pool forces KV-swap preemption; the
        generated tokens must match the reserve-policy run bit-exactly
        (pages are saved/restored to host, not recomputed)."""
        cfg, params = llm_setup
        reqs = [(list(range(1, 10)), 12), (list(range(30, 42)), 12)]
        base = ServingConfig(page_size=4, num_pages=32, max_batch=2,
                             prefix_caching=False)
        ref_eng = ServingEngine(params, cfg, base)
        ref_rids = [ref_eng.add_request(p, n) for p, n in reqs]
        ref = ref_eng.run()
        # pool of 8 pages cannot cover both worst cases (6 pages each)
        tight = ServingConfig(page_size=4, num_pages=8, max_batch=2,
                              admission="lazy", prefix_caching=False)
        eng = ServingEngine(params, cfg, tight)
        rids = [eng.add_request(p, n) for p, n in reqs]
        done = eng.run()
        assert eng.preemptions >= 1, eng.stats()
        for rid, rref in zip(rids, ref_rids):
            assert done[rid] == ref[rref], (done[rid], ref[rref])

    def test_lazy_concurrency_beats_reserve(self, llm_setup):
        """At equal pool size, lazy admission runs more requests
        concurrently (VERDICT r2 #9: admission beyond worst-case FIFO)."""
        cfg, params = llm_setup
        reqs = [(list(range(1 + i, 8 + i)), 10) for i in range(3)]

        def peak_concurrency(admission):
            eng = ServingEngine(params, cfg, ServingConfig(
                page_size=4, num_pages=10, max_batch=3,
                admission=admission, prefix_caching=False))
            for p, n in reqs:
                eng.add_request(p, n)
            peak = 0
            while len(eng.finished) < len(reqs):
                eng.step()
                peak = max(peak, int(eng._active.sum()))
            return peak

        # each request worst-cases 5 pages: reserve admits 2 at a time;
        # lazy starts all three (2 prompt pages each)
        assert peak_concurrency("reserve") <= 2
        assert peak_concurrency("lazy") == 3

    def test_engine_cancel(self, llm_setup):
        """cancel_request unblocks queued work and frees a running slot."""
        cfg, params = llm_setup
        eng = ServingEngine(
            params, cfg, ServingConfig(page_size=8, num_pages=4, max_batch=1,
                                       prefix_caching=False)
        )
        r0 = eng.add_request([1, 2, 3], 20)   # worst 3 pages
        r1 = eng.add_request([4, 5, 6, 7], 20)  # waits: no slot
        r2 = eng.add_request([9, 9], 2)
        eng.step()
        assert eng.stats()["active_slots"] == 1
        # cancel the waiting head -> r2 still behind r1? cancel r1 unblocks
        eng.cancel_request(r1)
        # cancel the running request -> slot frees, r2 admits and finishes
        got = eng.cancel_request(r0)
        assert len(got) >= 1  # r0 had produced its prefill token
        done = eng.run()
        assert len(done[r2]) == 2
        assert eng.cancel_request(r2) == done[r2]  # finished: no-op

    def test_int4_pages(self, llm_setup):
        """kv_bits=4 paged serving stays close to the int8 engine."""
        cfg, params = llm_setup
        prompt, max_new = PROMPTS[0]
        eng = ServingEngine(
            params,
            cfg,
            ServingConfig(page_size=8, num_pages=16, max_batch=2, kv_bits=4),
        )
        rid = eng.add_request(prompt, max_new)
        toks = eng.run()[rid]
        assert len(toks) == max_new
        assert all(0 <= t < cfg.vocab for t in toks)


def test_engine_k4v8_pages():
    """Per-side cache bits in the engine (ServingConfig k_bits/v_bits):
    the measured k4v8 decode winner is serveable — half-width K pages,
    generations track the int8-page engine."""
    import jax

    from lowbit_quant_fa2_paddle_tpu import serving
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.LLMConfig(vocab=64, dim=64, depth=1, num_heads=2,
                        num_kv_heads=1, max_seq=128)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    outs = {}
    for name, kw in (("int8", {}), ("k4v8", {"k_bits": 4, "v_bits": 8})):
        eng = serving.ServingEngine(
            params, cfg,
            serving.ServingConfig(page_size=8, num_pages=24, max_batch=2,
                                  prefix_caching=False, **kw),
        )
        if name == "k4v8":
            assert eng.caches[0]["k"].shape[-1] == cfg.head_dim // 2
            assert eng.caches[0]["v"].shape[-1] == cfg.head_dim
        rids = [eng.add_request(p, 10) for p in prompts]
        done = eng.run()
        outs[name] = [done[r] for r in rids]
    agree = sum(
        a == b for x, y in zip(outs["int8"], outs["k4v8"])
        for a, b in zip(x, y)
    ) / 20
    assert agree >= 0.6, (agree, outs)
