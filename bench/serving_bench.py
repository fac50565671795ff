"""Serving-engine throughput artifact: continuous batching vs static
batching, prefix caching, n-gram speculation, and windowed rolling
reclamation — measured end-to-end through ``ServingEngine`` on a
mixed-length workload.

The reference serves its decode experiments through the external sglang
runtime (/root/reference/src/triton/utils/main.py:14-15) and never
quantifies it; this driver produces the in-repo engine's throughput record
(VERDICT r3 #2).

Timing note: engine throughput is wall-clock over the whole run — every
tick device_gets the sampled tokens (a hard host sync), so the clock spans
real device + scheduler work; per-kernel numbers still come only from
measure_op_time (see DECODE_TPU.json). Comparisons (static vs continuous,
cache on/off, spec on/off) all run within ONE process on identical
workloads, and token streams are asserted identical where the semantics
guarantee it.

Usage: python bench/serving_bench.py [--json SERVING_TPU.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu import serving
from lowbit_quant_fa2_paddle_tpu.models import llm
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import device_memory_stats


def make_workload(n, seed=0, shared_frac=0.5, shared_len=192, vocab=256):
    """Mixed-length workload: prompt lengths drawn from page-multiple
    BUCKETS {64..320} (prefill jits per prompt shape — real engines bucket
    prefill exactly so a mixed workload doesn't compile per request),
    outputs 16-96; every ``round(1/shared_frac)``-th request opens with
    the same shared_len-token prefix (the prefix-cache case: system
    prompt / few-shot header) — the default is HALF the requests (the
    committed SERVING_TPU.json workload; an earlier 0.375 default was
    mislabeled — int(1/0.375) == 2 made it 0.5 in practice)."""
    rng = np.random.RandomState(seed)
    shared = rng.randint(0, vocab, size=shared_len).tolist()
    buckets = [64, 128, 192, 256, 320]
    reqs = []
    for i in range(n):
        out = int(rng.randint(16, 97))
        if i % max(1, round(1 / shared_frac)) == 0:
            plen = int(buckets[rng.randint(3, 5)])  # 256/320: room past prefix
            body = rng.randint(0, vocab, size=plen - shared_len).tolist()
            prompt = shared + body
        else:
            plen = int(buckets[rng.randint(0, 5)])
            prompt = rng.randint(0, vocab, size=plen).tolist()
        reqs.append((prompt, out))
    return reqs



def token_agreement(outs_a, outs_b):
    """Mean per-request token agreement between two engines' outputs,
    aligned by SUBMISSION ORDER (sorted rid) — rids differ across engines
    whenever their warm-request counts differ."""
    l1 = [outs_a[r] for r in sorted(outs_a)]
    l2 = [outs_b[r] for r in sorted(outs_b)]
    agree = [
        sum(a == b for a, b in zip(x, y)) / max(len(x), 1)
        for x, y in zip(l1, l2)
    ]
    return round(float(np.mean(agree)), 4)


def drive(params, cfg, scfg, reqs, *, static=False, interpret=None,
          warm_reqs=(), auto_warm=True):
    """Run the workload; returns (row, outputs). static=True emulates
    static batching: admit one batch, drain it fully, admit the next —
    the engine's own kernels/steps, no mid-flight refill. ``warm_reqs``:
    extra requests run before the clock so every jit/Mosaic shape the
    workload will touch (e.g. the chunked-prefill suffix buckets) compiles
    outside the timed region — steady-state serving numbers. ``auto_warm``
    additionally runs one random request per prompt-length bucket present
    in the workload: since r5 every prefill is a jitted program per prompt
    shape, and on the fast transport an in-clock compile (~2-5 s) would
    otherwise dominate the row and corrupt the POLICY comparison (random
    warms never hit the prefix cache; pass hit-shape warms via
    ``warm_reqs``)."""
    eng = serving.ServingEngine(params, cfg, scfg, interpret=interpret)
    # jit/Mosaic warmup outside the clock: one tiny request end-to-end
    print(f"[serving] warmup (static={static})...", file=sys.stderr, flush=True)
    warm_rids = {eng.add_request([1] * scfg.page_size, 2)}
    eng.run()
    if auto_warm:
        rngw = np.random.RandomState(97)
        for L in sorted({len(p) for p, _ in reqs}):
            warm_rids.add(
                eng.add_request(rngw.randint(0, 256, size=L).tolist(), 2))
            eng.run()
    for prompt, n_out in warm_reqs:
        warm_rids.add(eng.add_request(prompt, n_out))
        eng.run()
    st0 = eng.stats()  # counter snapshot: report workload-only deltas
    print("[serving] warmup done; running workload", file=sys.stderr, flush=True)
    ticks = 0
    occupancy = 0
    t0 = time.perf_counter()
    if static:
        outs = {}
        for i in range(0, len(reqs), scfg.max_batch):
            for prompt, n_out in reqs[i : i + scfg.max_batch]:
                eng.add_request(prompt, n_out)
            while eng._prompts or eng._active.any() or eng._paused:
                eng.step()
                ticks += 1
                occupancy += int(eng._active.sum())
        outs = eng.finished
    else:
        for prompt, n_out in reqs:
            eng.add_request(prompt, n_out)
        while eng._prompts or eng._active.any() or eng._paused:
            eng.step()
            ticks += 1
            occupancy += int(eng._active.sum())
        outs = eng.finished
    dt = time.perf_counter() - t0
    outs = {r: t for r, t in outs.items() if r not in warm_rids}
    n_tok = sum(len(t) for t in outs.values())
    st = eng.stats()
    row = {
        "wall_s": round(dt, 3),
        "gen_tokens": n_tok,
        "tokens_s": round(n_tok / dt, 1),
        "decode_ticks": ticks,
        # per-tick wall = device compute + the host<->device transport round
        # trip; on the axon relay the transport term DOMINATES at this model
        # size (see the `overhead` scenario, which separates the two) — the
        # absolute tokens/s here price the transport, the ratios price the
        # engine.
        "mean_tick_s": round(dt / max(ticks, 1), 3),
        "mean_active_slots": round(occupancy / max(ticks, 1), 2),
        "preemptions": st["preemptions"],
    }
    for k in ("prefix_hits", "prefix_misses", "spec_rounds"):
        if k in st:  # workload-only (warmup traffic subtracted)
            row[k] = st[k] - st0.get(k, 0)
    if "spec_tokens_per_round" in st:
        row["spec_tokens_per_round"] = st["spec_tokens_per_round"]
    mem = device_memory_stats()
    if mem:
        row["device_memory"] = mem
    return row, outs


def drive_staggered(params, cfg, scfg, short_reqs, long_reqs, *, stagger=4,
                    interpret=None, warm_reqs=()):
    """Seat the short requests first, then admit the long prompts MID-FLIGHT
    (the stall-free-scheduling scenario): per-tick wall times are recorded so
    an admission that blocks the decode batch shows up as a giant max_tick_s.
    Also records each long prompt's TTFT (add -> first sampled token)."""
    eng = serving.ServingEngine(params, cfg, scfg, interpret=interpret)
    print(f"[serving] staggered warmup (budget="
          f"{scfg.prefill_budget})...", file=sys.stderr, flush=True)
    warm_rids = {eng.add_request([1] * scfg.page_size, 2)}
    eng.run()
    for prompt, n_out in warm_reqs:
        warm_rids.add(eng.add_request(prompt, n_out))
        eng.run()
    print("[serving] staggered warmup done", file=sys.stderr, flush=True)
    tick_times = []
    t0 = time.perf_counter()
    for prompt, n_out in short_reqs:
        eng.add_request(prompt, n_out)
    for _ in range(stagger):
        t1 = time.perf_counter()
        eng.step()
        tick_times.append(time.perf_counter() - t1)
    long_rids = [eng.add_request(p, n) for p, n in long_reqs]
    t_add = time.perf_counter()
    ttft = {}
    while eng._prompts or eng._active.any() or eng._paused:
        t1 = time.perf_counter()
        eng.step()
        tick_times.append(time.perf_counter() - t1)
        for rid in long_rids:
            if rid not in ttft and eng.outputs.get(rid):
                ttft[rid] = time.perf_counter() - t_add
    dt = time.perf_counter() - t0
    outs = {r: t for r, t in eng.finished.items() if r not in warm_rids}
    n_tok = sum(len(t) for t in outs.values())
    row = {
        "wall_s": round(dt, 3),
        "gen_tokens": n_tok,
        "tokens_s": round(n_tok / dt, 1),
        "decode_ticks": len(tick_times),
        "mean_tick_s": round(float(np.mean(tick_times)), 3),
        # blocking engine: the long admission tick IS this number (it holds
        # every decode slot for the whole prefill); budgeted engine: a chunk
        # + one decode step
        "max_tick_s": round(float(np.max(tick_times)), 3),
        "long_prompt_ttft_s": [round(ttft[r], 3) for r in long_rids],
    }
    return row, outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-requests", type=int, default=32)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--scenarios", nargs="+",
                    default=["batching", "prefix", "spec", "window",
                             "multistep", "multistep-mixed", "async",
                             "chunked", "multistep-budget", "overhead"],
                    choices=["batching", "prefix", "spec", "window",
                             "multistep", "multistep-mixed", "async",
                             "chunked", "chunked-scale", "multistep-budget",
                             "overhead"],
                    help="scenario groups; comparisons within a group run "
                         "in ONE process (batching = static + continuous + "
                         "prefix cache)")
    args = ap.parse_args()

    cfg = llm.LLMConfig(
        vocab=256, dim=2048, depth=2, num_heads=16, num_kv_heads=4,
        max_seq=1024, dtype=jnp.bfloat16, kv_bits=8,
    )
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    interpret = True if args.interpret else None
    reqs = make_workload(args.n_requests)
    total_pages = 144
    base = dict(page_size=64, num_pages=total_pages, max_batch=8, kv_bits=8,
                max_pages_per_seq=12)
    results = {}
    if args.json and os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f).get("results", {})

    if "batching" in args.scenarios:
        # 1+2: static vs continuous batching, identical pool, prefix cache
        # off (isolates the batching policy), identical workload.
        row_s, outs_s = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            reqs, static=True, interpret=interpret)
        results["static_batching"] = row_s
        row_c, outs_c = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            reqs, interpret=interpret)
        row_c["speedup_vs_static"] = round(row_s["wall_s"] / row_c["wall_s"], 3)
        results["continuous_batching"] = row_c
        # batching policy must not change any request's tokens
        assert set(outs_s) == set(outs_c)
        ident = all(outs_s[r] == outs_c[r] for r in outs_s)
        row_c["tokens_identical_to_static"] = bool(ident)

    if "prefix" in args.scenarios:
        # 3: automatic prefix caching on the shared-prefix workload —
        # steady-state (chunked-prefill shapes warmed outside the clock;
        # the shared prefix is already cached when the clock starts, as in
        # a serving deployment with a standing system prompt). Both rows
        # run in THIS process on the identical workload.
        rng = np.random.RandomState(11)
        shared = list(make_workload(1, seed=0)[0][0][:192])
        # two rounds per suffix bucket: round 1 registers the shared pages
        # (miss shapes), round 2 HITS them — warming the (3-page, 64/128)
        # chunk shapes the workload's cache hits will take
        warm = [
            (shared + rng.randint(0, 256, size=64).tolist(), 2),
            (shared + rng.randint(0, 256, size=128).tolist(), 2),
            (shared + rng.randint(0, 256, size=64).tolist(), 2),
            (shared + rng.randint(0, 256, size=128).tolist(), 2),
        ]
        row_c2, outs_c2 = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            reqs, interpret=interpret, warm_reqs=warm)
        results["continuous_no_cache_warm"] = row_c2
        row_p, outs_p = drive(
            params, cfg, serving.ServingConfig(prefix_caching=True, **base),
            reqs, interpret=interpret, warm_reqs=warm)
        row_p["speedup_vs_no_cache"] = round(
            row_c2["wall_s"] / row_p["wall_s"], 3)
        # cache hits only change PREFILL math (chunked + int8 prefix KV),
        # never decode: generations must agree with the no-cache run except
        # where the documented quantization approximation flips an argmax
        agree = np.mean([outs_c2[r] == outs_p[r] for r in outs_c2])
        row_p["generation_agreement_vs_no_cache"] = round(float(agree), 3)
        results["continuous_prefix_cache"] = row_p

    if "spec" in args.scenarios:
        # 4: n-gram speculative serving on a repetitive workload (structured
        # text — the case prompt-lookup decoding exists for)
        rng = np.random.RandomState(3)
        motif = rng.randint(0, 256, size=24).tolist()
        spec_reqs = [
            (motif * 8, 64) for _ in range(12)  # 192-token prompt bucket
        ]
        row_ns, outs_ns = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            spec_reqs, interpret=interpret)
        results["repetitive_no_spec"] = row_ns
        row_sp, outs_sp = drive(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, spec_ngram=2,
                                  spec_k=4, **base),
            spec_reqs, interpret=interpret)
        row_sp["speedup_vs_no_spec"] = round(
            row_ns["wall_s"] / row_sp["wall_s"], 3)
        ident_sp = (set(outs_ns) == set(outs_sp)
                    and all(outs_ns[r] == outs_sp[r] for r in outs_ns))
        row_sp["tokens_identical_to_no_spec"] = bool(ident_sp)
        results["repetitive_ngram_spec"] = row_sp

    if "multistep" in args.scenarios:
        # 6: multi-step decode segments — the steady-serving regime (no
        # queue: one request per slot, long outputs), where per-tick host
        # round trips otherwise bound throughput. Token identity with the
        # single-step engine is asserted.
        rng = np.random.RandomState(7)
        ms_reqs = [
            (rng.randint(0, 256, size=128).tolist(), 96) for _ in range(8)
        ]
        # segment-ladder warms (n=8/4/2 scan variants) — in-clock compiles
        # of the scanned 8-step program would otherwise dominate the row
        # on the fast transport
        seg_warm = [(rng.randint(0, 256, size=128).tolist(), n)
                    for n in (20, 6, 3)]
        row_1, outs_1 = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            ms_reqs, interpret=interpret)
        results["steady_single_step"] = row_1
        row_m, outs_m = drive(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, multi_step=8, **base),
            ms_reqs, interpret=interpret, warm_reqs=seg_warm)
        row_m["speedup_vs_single_step"] = round(
            row_1["wall_s"] / row_m["wall_s"], 3)
        # The scanned segment runs the SAME step math (CPU: bit-identical,
        # tests/test_serving_flow.py) but is a different XLA program, so
        # bf16 reductions may fuse in a different order — near-argmax ties
        # on this random-weight model can flip. Report the agreement rate.
        # align by submission order (rids differ: the segment engine ran
        # extra warm requests)
        row_m["token_agreement_vs_single_step"] = token_agreement(outs_1, outs_m)
        results["steady_multi_step8"] = row_m
        # ...and further up the segment ladder: n=32 keeps amortizing the
        # tick round trip until retirement granularity (96-token outputs)
        # caps it — the committed steady record (1693 tok/s, 6.29x).
        seg_warm32 = [(rng.randint(0, 256, size=128).tolist(), k)
                      for k in (40, 20, 10)]
        row_m32, outs_m32 = drive(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, multi_step=32,
                                  **base),
            ms_reqs, interpret=interpret, warm_reqs=seg_warm + seg_warm32)
        row_m32["speedup_vs_single_step"] = round(
            row_1["wall_s"] / row_m32["wall_s"], 3)
        row_m32["token_agreement_vs_single_step"] = token_agreement(
            outs_1, outs_m32)
        results["steady_multi_step32"] = row_m32

    if "multistep-mixed" in args.scenarios:
        # ...and on the mixed continuous-batching workload (queue > slots):
        # segments engage whenever admission is blocked, so the win carries
        # over to the loaded regime too. Same-process pair, every prompt
        # bucket's prefill warmed outside the clock.
        rngw = np.random.RandomState(21)
        bucket_warm = [
            (rngw.randint(0, 256, size=L).tolist(), 2)
            for L in (128, 192, 256, 320)
        ]
        row_c1, outs_cm1 = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            reqs, interpret=interpret, warm_reqs=bucket_warm)
        results["mixed_single_step"] = row_c1
        row_cm, outs_cm = drive(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, multi_step=8, **base),
            reqs, interpret=interpret,
            # warm requests with budgets hitting every segment-ladder size
            # (n=8/4/2) so all scan variants compile outside the clock
            warm_reqs=bucket_warm + [
                (bucket_warm[0][0], 16),
                (bucket_warm[0][0], 5),
                (bucket_warm[0][0], 3),
            ])
        row_cm["speedup_vs_single_step"] = round(
            row_c1["wall_s"] / row_cm["wall_s"], 3)
        # align by submission order (rids differ across engines when the
        # warm request counts differ)
        row_cm["token_agreement_vs_single_step"] = token_agreement(outs_cm1, outs_cm)
        results["mixed_multi_step8"] = row_cm

    if "chunked" in args.scenarios:
        # 8: budgeted chunked-prefill scheduling (Sarathi/SplitFuse class) —
        # long prompts admitted MID-FLIGHT against a live decode batch.
        # Blocking engine: the admission tick synchronously prefills the
        # whole prompt while every decode slot stalls (max_tick_s IS the
        # stall). Budgeted engine: one chunk per tick interleaved with
        # decode. Same process, same workload; streams agree up to the
        # documented chunk-boundary quantization approximation.
        rngc = np.random.RandomState(31)
        shorts = [(rngc.randint(0, 256, size=128).tolist(), 64)
                  for _ in range(6)]
        longs = [(rngc.randint(0, 256, size=768).tolist(), 16)
                 for _ in range(2)]
        pool_c = dict(page_size=64, num_pages=144, max_batch=8, kv_bits=8,
                      max_pages_per_seq=16)
        warm_c = [(shorts[0][0], 2), (longs[0][0], 2)]
        row_bk, outs_bk = drive_staggered(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, **pool_c),
            shorts, longs, interpret=interpret, warm_reqs=warm_c)
        results["longprompt_blocking"] = row_bk
        row_bu, outs_bu = drive_staggered(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, prefill_budget=128,
                                  **pool_c),
            shorts, longs, interpret=interpret, warm_reqs=warm_c)
        row_bu["speedup_vs_blocking"] = round(
            row_bk["wall_s"] / row_bu["wall_s"], 3)
        row_bu["stall_reduction_max_tick"] = round(
            row_bk["max_tick_s"] / max(row_bu["max_tick_s"], 1e-9), 2)
        row_bu["token_agreement_vs_blocking"] = token_agreement(outs_bk, outs_bu)
        row_bu["note"] = (
            "max_tick_s IS the blocking engine's admission stall (every "
            "decode slot freezes for the whole one-shot prefill; both "
            "engines' prefills are jitted device programs since r5 — at "
            "the 128K scale the same stall is the ~80 s chunked-prefill "
            "wall of LLM_E2E --real-prefill); agreement < 1.0 is the "
            "documented chunk-boundary quantization + program-boundary "
            "argmax-tie class")
        results["longprompt_chunked_budget"] = row_bu

    if "chunked-scale" in args.scenarios:
        # 8b: the stall at PRODUCTION scale — a 64K-token admission against
        # a live decode slot on the LLM_E2E-class model (dim 4096 depth 3,
        # GQA 32/8, hd128), where one-shot prefill is device-bound SECONDS
        # (not the toy model's ~0.1 s): max_tick_s is the real slot freeze
        # the budget removes. budget=16384 -> 4 chunks.
        cfg_s = llm.LLMConfig(
            vocab=256, dim=4096, depth=3, num_heads=32, num_kv_heads=8,
            max_seq=66560, dtype=jnp.bfloat16, kv_bits=8,
        )
        params_s = llm.init_llm_params(jax.random.PRNGKey(1), cfg_s)
        rngs = np.random.RandomState(61)
        shorts_s = [(rngs.randint(0, 256, size=128).tolist(), 48)]
        longs_s = [(rngs.randint(0, 256, size=65536).tolist(), 4)]
        pool_s = dict(page_size=64, num_pages=1100, max_batch=2,
                      kv_bits=8, max_pages_per_seq=1050)
        warm_s = [(shorts_s[0][0], 2), (longs_s[0][0], 2)]
        row_sb, outs_sb = drive_staggered(
            params_s, cfg_s,
            serving.ServingConfig(prefix_caching=False, **pool_s),
            shorts_s, longs_s, interpret=interpret, warm_reqs=warm_s)
        results["scale64k_blocking"] = row_sb
        row_su, outs_su = drive_staggered(
            params_s, cfg_s,
            serving.ServingConfig(prefix_caching=False,
                                  prefill_budget=16384, **pool_s),
            shorts_s, longs_s, interpret=interpret, warm_reqs=warm_s)
        row_su["speedup_vs_blocking"] = round(
            row_sb["wall_s"] / row_su["wall_s"], 3)
        row_su["stall_reduction_max_tick"] = round(
            row_sb["max_tick_s"] / max(row_su["max_tick_s"], 1e-9), 2)
        row_su["token_agreement_vs_blocking"] = token_agreement(
            outs_sb, outs_su)
        results["scale64k_chunked_budget"] = row_su

    if "multistep-budget" in args.scenarios:
        # 9: multi-step + budgeted chunked prefill on the MIXED workload —
        # the r4 regression case (multi-step gated off under load lost
        # 0.91x). With the budget the empty-queue gate relaxes: segments
        # engage under load because admissions chunk instead of block.
        rngw = np.random.RandomState(21)
        bucket_warm = [
            (rngw.randint(0, 256, size=L).tolist(), 2)
            for L in (128, 192, 256, 320)
        ]
        seg_warm = [(bucket_warm[0][0], 16), (bucket_warm[0][0], 5),
                    (bucket_warm[0][0], 3)]
        row_m1, outs_m1 = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            reqs, interpret=interpret, warm_reqs=bucket_warm)
        results["mixed_single_step_base"] = row_m1
        row_mb, outs_mb = drive(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, multi_step=8,
                                  prefill_budget=128, **base),
            reqs, interpret=interpret, warm_reqs=bucket_warm + seg_warm)
        row_mb["speedup_vs_single_step"] = round(
            row_m1["wall_s"] / row_mb["wall_s"], 3)
        row_mb["token_agreement_vs_single_step"] = token_agreement(outs_m1, outs_mb)
        results["mixed_multistep8_budget"] = row_mb

    if "overhead" in args.scenarios:
        # 10: transport-vs-compute honesty row (VERDICT r4 weak #3): device
        # time of ONE batched decode step via measure_op_time vs the
        # engine's mean tick wall on a steady full batch — the difference
        # is the per-tick host round trip every absolute tokens/s figure in
        # this file pays.
        import functools as _ft

        from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
            measure_op_time,
        )

        rngo = np.random.RandomState(41)
        eng = serving.ServingEngine(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, **base),
            interpret=interpret)
        for _ in range(base["max_batch"]):
            eng.add_request(rngo.randint(0, 256, size=128).tolist(), 512)
        for _ in range(4):  # seat everyone + compile the decode step
            eng.step()
        n_ticks = 24
        t0 = time.perf_counter()
        for _ in range(n_ticks):
            eng.step()
        tick_wall = (time.perf_counter() - t0) / n_ticks
        step_fn = jax.jit(_ft.partial(
            serving._decode_step, cfg=cfg, page_size=base["page_size"],
            kv_bits=(8, 8), interpret=interpret))
        dev_args = (
            params, eng.caches, jnp.asarray(eng._next_tok),
            jnp.asarray(eng._lengths), jnp.asarray(eng._table),
            jnp.asarray(eng._active),
        )
        dev_t = measure_op_time(
            lambda *a: step_fn(*a)[0], dev_args, r1=8, r2=24, samples=4)
        results["tick_overhead"] = {
            "mean_tick_wall_s": round(tick_wall, 4),
            "decode_step_device_s": round(dev_t, 4),
            "dispatch_overhead_s": round(tick_wall - dev_t, 4),
            "note": "dispatch_overhead_s is the per-tick host round trip "
                    "(argmax fetch + retrace + transport) every absolute "
                    "tokens/s row in this artifact pays; ratios are "
                    "transport-invariant (same process, same tick shape)",
        }
        print(f"[serving] tick {tick_wall*1e3:.1f} ms vs device "
              f"{dev_t*1e3:.1f} ms", file=sys.stderr)

    if "async" in args.scenarios:
        # 7: asynchronous scheduling — tokens stay on device, values fetch
        # only at retirements. Unlike multi_step this keeps per-tick
        # admissions, so it applies to the loaded mixed regime too. Pairs
        # run in one process, prompt buckets warmed outside the clock.
        rngw = np.random.RandomState(23)
        bucket_warm = [
            (rngw.randint(0, 256, size=L).tolist(), 2)
            for L in (128, 192, 256, 320)
        ]
        row_s1, outs_s1 = drive(
            params, cfg, serving.ServingConfig(prefix_caching=False, **base),
            reqs, interpret=interpret, warm_reqs=bucket_warm)
        results["mixed_sync_fetch"] = row_s1
        row_a, outs_a = drive(
            params, cfg,
            serving.ServingConfig(prefix_caching=False, async_fetch=True,
                                  **base),
            reqs, interpret=interpret, warm_reqs=bucket_warm)
        row_a["speedup_vs_sync_fetch"] = round(
            row_s1["wall_s"] / row_a["wall_s"], 3)
        row_a["token_agreement_vs_sync"] = token_agreement(outs_s1, outs_a)
        row_a["tokens_identical_to_sync"] = (
            row_a["token_agreement_vs_sync"] == 1.0)
        # async samples argmax IN-PROGRAM (_decode_sample_step) while sync
        # argmaxes on host — two XLA programs, so bf16 fusion order can
        # flip near-argmax ties on a random-weight model (CPU tests assert
        # bit-identity where the programs match; the trained-model ladder
        # shows tie flips don't change task accuracy)
        results["mixed_async_fetch"] = row_a

    if "window" in args.scenarios:
        # 5: windowed engine — bounded pool, rolling reclamation, long
        # outputs (generation length exceeds what the pool could hold
        # untrimmed); plus the r5 multi-step composition (segments trim
        # conservatively below their first position) — same process,
        # token agreement reported.
        wcfg = llm.LLMConfig(
            vocab=256, dim=2048, depth=2, num_heads=16, num_kv_heads=4,
            max_seq=2048, dtype=jnp.bfloat16, kv_bits=8,
            window_size=128, sink_size=16,
        )
        wparams = llm.init_llm_params(jax.random.PRNGKey(0), wcfg)
        wreqs = [(make_workload(1, seed=50 + i)[0][0], 192) for i in range(8)]
        wpool = dict(page_size=64, num_pages=48, max_batch=8, kv_bits=8,
                     max_pages_per_seq=16, prefix_caching=False)
        row_w, outs_w = drive(
            wparams, wcfg, serving.ServingConfig(**wpool),
            wreqs, interpret=interpret)
        results["windowed_rolling"] = row_w
        wseg_warm = [(wreqs[0][0], n) for n in (20, 6, 3)]
        row_wm, outs_wm = drive(
            wparams, wcfg,
            serving.ServingConfig(multi_step=8, **wpool),
            wreqs, interpret=interpret, warm_reqs=wseg_warm)
        row_wm["speedup_vs_single_step"] = round(
            row_w["wall_s"] / row_wm["wall_s"], 3)
        row_wm["token_agreement_vs_single_step"] = token_agreement(
            outs_w, outs_wm)
        results["windowed_multi_step8"] = row_wm

    out = {
        "config": dict(
            model=dict(dim=cfg.dim, depth=cfg.depth, h=cfg.num_heads,
                       hk=cfg.num_kv_heads, d=cfg.head_dim, kv_bits=8),
            pool=base, n_requests=args.n_requests,
            device=jax.devices()[0].device_kind,
        ),
        "results": results,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
