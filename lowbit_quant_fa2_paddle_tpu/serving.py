"""Continuous-batching LLM serving engine over the paged quantized-KV stack.

The reference serves its decode experiments through the external sglang
runtime (model-parallel init + scheduler around quant_sglang_triton_attn.py;
reference src/triton/utils/main.py:14-15). Here the serving runtime is
in-repo and TPU-native:

  * control plane: the native C++ continuous-batching scheduler
    (``host.Scheduler``, csrc/lowbit_host.cpp) — FIFO admission over decode
    slots + a paged KV pool with worst-case reservation accounting, lazy page
    allocation, zero-preemption by construction;
  * data plane: one jitted fixed-shape decode step per engine — the batch of
    running requests shares a single paged int8/int4 KV cache per layer
    (``[Hk, num_pages, page, D]``) and one ``ops.decode.decode_attention``
    paged-kernel call per layer (page table scalar-prefetched, GQA, per-token
    scales); new tokens' K/V are quantized and scattered into their pages
    in-step (inactive slots write to an out-of-range page id and are dropped).

Request lifecycle: ``add_request`` queues -> scheduler admits (prompt pages
allocated) -> int8 prefill writes the prompt's quantized KV into its pages
and samples the first token -> the request joins the batched decode step
until ``max_new_tokens`` -> pages/slot released. With
``ServingConfig(prefill_budget=...)`` the prefill stage is BUDGETED
(Sarathi-Serve / SplitFuse class): one bounded chunk per tick interleaved
with the decode step, so admissions never stall live decode slots.

Distributed serving (context-sharded caches, head-sharded TP decode) lives
in parallel/serving.py; this engine is the single-host control loop around
the same kernels.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import hashlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu import host
from lowbit_quant_fa2_paddle_tpu.models import llm as L
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """Engine shape knobs (all static under jit)."""

    page_size: int = 64  # tokens per KV page == decode block_kv
    num_pages: int = 64  # shared page pool size
    max_batch: int = 4  # decode slots
    kv_bits: int = 8  # 8 (int8) or 4 (nibble-packed) KV pages
    # Per-side overrides (LLMConfig parity): e.g. k_bits=4, v_bits=8 serves
    # the measured 128K latency+memory winner k4v8 (DECODE_TPU.json).
    k_bits: Optional[int] = None
    v_bits: Optional[int] = None
    # Static page-table width (max pages any one sequence may hold);
    # defaults to the whole pool.
    max_pages_per_seq: Optional[int] = None
    # Automatic prefix caching: requests whose leading full prompt pages
    # hash-match a previous prompt share those pages copy-free AND skip
    # their prefill compute (chunked prefill + LSE merge).
    #
    # APPROXIMATION NOTE: a cache hit computes first-token logits through
    # the chunked path (suffix attention over int8-dequantized cached
    # prefix KV, LSE-merged with the suffix's causal self-attention) while
    # a miss computes them through the full bf16-activation prefill. The
    # two differ by quantization error on the prefix KV (logits cosine
    # > 0.999, tracked by tests/test_serving.py::test_chunked_prefill_
    # accuracy), so a prompt that hits the cache can in principle sample a
    # different token near an argmax tie than the same prompt run solo.
    # Set prefix_caching=False where bit-exact solo/batched invariance is
    # required.
    prefix_caching: bool = True
    # Admission policy: "reserve" (default) admits only when the pool can
    # cover a request's worst-case page need, so decode-time growth can
    # never fail; "lazy" admits as soon as the prompt's own pages fit —
    # much higher admitted concurrency on bursty mixed-length workloads —
    # and relieves decode-time page pressure by LRU cache eviction followed
    # by preemption (youngest request's KV pages are swapped to host
    # memory bit-exactly and restored on resume, so generated tokens are
    # invariant to preemption).
    admission: str = "reserve"
    # N-gram speculative decoding (prompt-lookup — vLLM's draft-model-free
    # 'ngram' speculator): when spec_ngram > 0, each step drafts up to
    # spec_k - 1 continuation tokens by matching the last spec_ngram tokens
    # against the slot's own history, and scores ALL of them in ONE
    # multi-token verify step (ops/decode.py q_tokens — one cache stream).
    # Output is EXACTLY the non-speculative greedy generation; repetitive
    # text (code, quotations, structured data) decodes several tokens per
    # cache pass. Requires admission="reserve".
    spec_ngram: int = 0
    spec_k: int = 4
    # Multi-step decode segments (vLLM's multi-step scheduling): when > 1
    # and the queue is empty, the engine runs up to `multi_step` decode
    # steps as ONE on-device lax.scan dispatch (greedy argmax feeds back
    # on device), amortizing the per-tick host round trip that otherwise
    # bounds serving throughput on dispatch-latency-heavy transports
    # (measured 4.69x steady-state tokens/s on the r5 unified engine,
    # SERVING_TPU.json). The segment
    # runs the SAME step body — bit-identical to single ticks on CPU
    # (tests/test_serving_flow.py) — but as a separately-compiled XLA
    # program, so bf16 reductions may fuse in a different order and
    # near-argmax ties can flip (the standard recompilation caveat for
    # greedy decoding). Admissions are only considered at segment
    # boundaries, so waiting work delays by at most one segment. Requires
    # admission="reserve"; not combinable with spec_ngram (the speculative
    # tick is already multi-token). Sliding-window models compose (r5):
    # rolling reclamation trims conservatively below the segment's FIRST
    # position (the spec_slack mechanism), so the live-page bound grows by
    # at most one segment and every page a mid-segment step can read
    # survives.
    multi_step: int = 1
    # Budgeted chunked-prefill scheduling (Sarathi-Serve / DeepSpeed-FastGen
    # SplitFuse class): when set, an admitted request's prompt prefills in
    # chunks of at most `prefill_budget` tokens, ONE chunk per engine tick,
    # interleaved with the batched decode step — so a long-prompt admission
    # never stalls live decode slots (the blocking engine synchronously
    # prefills the whole prompt inside the admission tick; a 128K prompt
    # would freeze every running request for the full prefill). Each chunk
    # runs causal self-attention within the chunk plus cross-attention over
    # the request's own already-written quantized pages, merged through the
    # kernels' base-2 LSE contract — the N-chunk generalization of the
    # prefix-cache path below, sharing its machinery and its approximation
    # class (chunk boundaries see int8/int4-quantized prefix KV, so
    # first-token logits drift by quantization-level amounts vs the one-shot
    # prefill: cosine > 0.999, tests/test_serving.py). Prompts that fit in
    # ONE chunk (<= budget, no cache hit) take the unchunked path and are
    # BIT-identical to the blocking engine. When the decode batch is idle,
    # chunks run back-to-back so a solo long prompt keeps blocking-prefill
    # TTFT. Rounded up to a page multiple (chunks must end on page
    # boundaries so the prefix gather reads whole pages). Requires
    # admission="reserve" (a half-prefilled request is not preemptible).
    # Sliding-window models chunk too (r5): the prefix cross-attention
    # runs causal-banded at the suffix's global offset with global sinks,
    # and the banded grid skips below-window prefix blocks statically.
    # Composes with prefix_caching, spec_ngram, multi_step (whose
    # empty-queue gate relaxes: admissions and chunks still proceed at
    # every segment boundary), and async_fetch.
    prefill_budget: Optional[int] = None
    # Asynchronous scheduling (vLLM async-scheduling analog): keep sampled
    # tokens ON DEVICE and feed them straight into the next tick's decode —
    # the per-tick value fetch exists only to read token VALUES, but
    # scheduling needs only COUNTS (appends, page tables, retirement-by-
    # budget are all value-free). Values materialize in one batched fetch
    # at each retirement (and at cancel/drain). Admissions still happen
    # every tick, so unlike multi_step there is no occupancy tradeoff in
    # mixed workloads. Requires admission="reserve"; excludes spec_ngram,
    # multi_step, and per-request eos_token (each needs token values per
    # tick). Measured on the axon relay (r5 unified engine): **3.46x**
    # mixed tokens/s (SERVING_TPU.json mixed_async_fetch — the per-tick
    # value fetch was ~20 of the 28 ms tick; an earlier r4 measurement on
    # a dispatch-dominated transport read 0.95x, so the win is
    # transport-dependent). Tokens are bit-identical to sync where the
    # XLA programs match (CPU tests); on hardware the in-program argmax
    # is a different program than sync's host argmax, so near-argmax
    # ties can flip (agreement 0.966 on a random-weight model; task
    # accuracy unchanged on the trained ladder). Default off.
    async_fetch: bool = False

    @property
    def table_width(self) -> int:
        return self.num_pages if self.max_pages_per_seq is None else self.max_pages_per_seq

    @property
    def eff_k_bits(self) -> int:
        return self.kv_bits if self.k_bits is None else self.k_bits

    @property
    def eff_v_bits(self) -> int:
        return self.kv_bits if self.v_bits is None else self.v_bits


def _empty_paged_caches(cfg: L.LLMConfig, scfg: ServingConfig) -> List[dict]:
    hk, hd = cfg.num_kv_heads, cfg.head_dim
    dk = hd if scfg.eff_k_bits == 8 else hd // 2
    dv = hd if scfg.eff_v_bits == 8 else hd // 2
    shape_s = (hk, scfg.num_pages, scfg.page_size)
    return [
        {
            "k": jnp.zeros((hk, scfg.num_pages, scfg.page_size, dk), jnp.int8),
            "v": jnp.zeros((hk, scfg.num_pages, scfg.page_size, dv), jnp.int8),
            "k_scale": jnp.ones(shape_s, jnp.float32),
            "v_scale": jnp.ones(shape_s, jnp.float32),
        }
        for _ in range(cfg.depth)
    ]


class PrefixCache:
    """Hash-chained prefix-page cache (vLLM-style automatic prefix caching).

    Each FULL prompt page is keyed by the SHA-256 digest of its token bytes
    chained with the previous page's digest — a collision-resistant key of
    the full token prefix, so a lookup hit cannot silently attach another
    prompt's KV pages (Python's ``hash()`` is 64-bit and collision-prone at
    scale; vLLM moved to strong hashes for exactly this failure mode).
    Cached pages are pinned in the scheduler's refcounted pool
    (``ref_page``/``unref_page``) and shared copy-free across requests —
    shared pages are read-only by construction (decode positions start past
    the prompt, and the last usable prefix page is always private). Eviction
    is LRU and only drops the cache's own pin: pages still referenced by
    running requests survive until they finish.
    """

    def __init__(self, sched: host.Scheduler, page_size: int):
        self._sched = sched
        self._page = page_size
        self._entries: "collections.OrderedDict[bytes, int]" = collections.OrderedDict()
        self.hits = 0
        self.misses = 0

    def _chain(self, prompt: np.ndarray):
        digest = b""
        tokens = np.ascontiguousarray(prompt, np.int64)
        for j in range(len(prompt) // self._page):
            page_bytes = tokens[j * self._page : (j + 1) * self._page].tobytes()
            digest = hashlib.sha256(digest + page_bytes).digest()
            yield j, digest

    def lookup(self, prompt: np.ndarray, max_pages: int) -> List[int]:
        """Longest cached page-run covering the prompt's leading full pages
        (capped so at least one prompt token stays uncached). Hit/miss
        accounting happens once per request, at prefill time."""
        pids: List[int] = []
        for j, h in self._chain(prompt):
            if j >= max_pages:
                break
            pid = self._entries.get(h)
            if pid is None:
                break
            self._entries.move_to_end(h)
            pids.append(pid)
        return pids

    def register(self, prompt: np.ndarray, pages: Sequence[int]) -> None:
        """Pin + index every full prompt page of a just-prefilled request."""
        for j, h in self._chain(prompt):
            if h in self._entries:
                self._entries.move_to_end(h)
                continue
            self._sched.ref_page(pages[j])
            self._entries[h] = pages[j]

    def evict_one(self) -> bool:
        """Evict the least-recently-used entry whose page actually returns
        to the free pool, skipping entries still pinned by waiting/running
        requests — dropping those pins frees nothing and only destroys
        reusable cache state. Returns False when no evictable entry exists
        (callers use this as the stop condition under page pressure)."""
        for key, pid in self._entries.items():
            if self._sched.page_ref(pid) == 1:  # only the cache's pin remains
                del self._entries[key]
                self._sched.unref_page(pid)
                return True
        return False

    def __len__(self) -> int:
        return len(self._entries)


# Base-2 LSE merge — ONE implementation, shared with chunked prefill
# (models/llm.py) so the prefix-cache and chunked-prefill paths cannot
# drift numerically.
_merge_lse = L.merge_lse


def _chunked_prefill_forward(
    params: Params,
    suffix: jax.Array,  # [1, S_suf] — prompt tokens past the cached prefix
    prefix_kv: List[tuple],  # per layer: (k_codes [Hk,Sp,dk], ks [Hk,Sp], v_codes, vs)
    s_pre: int,
    cfg: L.LLMConfig,
    kv_bits: Tuple[int, int],  # (k_bits, v_bits) of the paged caches
    interpret: Optional[bool],
    prefix_valid: Optional[jax.Array] = None,  # traced count of REAL rows
) -> Tuple[jax.Array, List[tuple]]:
    """Prefill that REUSES cached quantized prefix KV: the suffix's causal
    self-attention and its cross-attention over the prefix pages are computed
    separately and merged through their base-2 LSEs — so a shared prompt
    prefix costs zero recompute (reference has no analog; its prefill always
    starts from scratch).

    ``prefix_valid``: when the prefix arrays are PADDED to a bucketed shape
    (budgeted chunked prefill bounds its compile count by padding the
    prefix-page gather to powers of two), this traced scalar gives the true
    prefix length — pad rows are excluded exactly via the kernel's
    segment-id mask and positions use the true length."""
    b, s = suffix.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][suffix]
    pos0 = s_pre if prefix_valid is None else prefix_valid
    pos = jnp.broadcast_to(pos0 + jnp.arange(s), (b, s))
    seg_kw = {}
    if prefix_valid is not None:
        seg_kw = dict(
            q_segment_ids=jnp.zeros((1, s), jnp.int32),
            kv_segment_ids=(
                jnp.arange(s_pre)[None] >= prefix_valid
            ).astype(jnp.int32),
        )
    per_layer = []
    for blk, (kc_pre, ks_pre, vc_pre, vs_pre) in zip(params["blocks"], prefix_kv):
        xa = L._rms_norm(x, blk["ln1"])
        q = L._mm(xa, blk["wq"], interpret).reshape(b, s, h, hd).swapaxes(1, 2)
        k = L._mm(xa, blk["wk"], interpret).reshape(b, s, hk, hd).swapaxes(1, 2)
        v = L._mm(xa, blk["wv"], interpret).reshape(b, s, hk, hd).swapaxes(1, 2)
        q = L._rope(q, pos, cfg.rope_theta)
        k = L._rope(k, pos, cfg.rope_theta)

        # V prefix: exact per-token dequant (the kernel's int8-V fast path
        # wants per-channel scales; per-token V scales fold here instead).
        kb, vb = kv_bits
        v_pre = L._dequant_cache_rows(vc_pre, vs_pre, vb, jnp.bfloat16)
        # Sliding-window models (budget + window, r5): the cross-attention
        # over the prefix runs CAUSAL-BANDED with the suffix's global
        # offset — every prefix key precedes every suffix q, so the causal
        # arm is vacuous and the band (q - W, q] plus the global sink
        # anchors [0, sink) are exactly the windowed semantics; the banded
        # grid statically skips prefix blocks below every q's window.
        # Requires an EXACT prefix (prefix_valid bucketing stays
        # full-causal-only: q_position_offset is static).
        cross_kw = dict(is_causal=False)
        self_kw = {}
        if cfg.window_size is not None:
            assert prefix_valid is None, "windowed chunks use exact prefixes"
            cross_kw = dict(
                is_causal=True, window_size=cfg.window_size,
                sink_size=cfg.sink_size, q_position_offset=s_pre,
            )
            # suffix self-attention: same band; suffix keys are global
            # sinks only where s_pre < sink_size (within-chunk distances
            # equal global distances, so offset 0 is correct for the band)
            self_kw = dict(
                window_size=cfg.window_size,
                sink_size=max(0, cfg.sink_size - s_pre),
            )
        if kb == 4:
            k_pre = L._dequant_cache_rows(kc_pre, ks_pre, 4, jnp.bfloat16)
            o1, l1 = lowbit_attention(
                q, k_pre[None], v_pre[None], fused_quant=True,
                return_lse=True, interpret=interpret,
                **seg_kw, **cross_kw,
            )
        else:
            o1, l1 = lowbit_attention(
                q, kc_pre[None], v_pre[None], k_scale=ks_pre[None],
                fused_quant_q=True, return_lse=True,
                interpret=interpret, **seg_kw, **cross_kw,
            )
        o2, l2 = lowbit_attention(
            q, k, v.astype(jnp.bfloat16), fused_quant=True,
            is_causal=True, return_lse=True, interpret=interpret, **self_kw,
        )
        o = _merge_lse(o1, l1, o2, l2)
        x = x + L._mm(o.swapaxes(1, 2).reshape(b, s, -1).astype(x.dtype), blk["wo"], interpret)
        xm = L._rms_norm(x, blk["ln2"])
        x = x + L._mm(jax.nn.silu(L._mm(xm, blk["w1"], interpret)), blk["w2"], interpret)

        kq, ks = jax.vmap(
            functools.partial(dec.quantize_token, bits=kv_bits[0]),
            in_axes=2, out_axes=2)(k)
        vq, vs = jax.vmap(
            functools.partial(dec.quantize_token, bits=kv_bits[1]),
            in_axes=2, out_axes=2)(v)
        per_layer.append((kq[0], ks[0], vq[0], vs[0]))

    logits = L._rms_norm(x[:, -1], params["ln_f"]) @ params["embed"].T
    return logits[0], per_layer


def _prefill_forward(
    params: Params,
    tokens: jax.Array,  # [1, S]
    cfg: L.LLMConfig,
    kv_bits: Tuple[int, int],
    interpret: Optional[bool],
) -> Tuple[jax.Array, List[tuple]]:
    """Prompt forward (int8 causal attention, models/llm.py dataflow) that
    returns the LAST token's logits plus each layer's per-token quantized
    K/V rows — the engine scatters those into the request's pages."""
    b, s = tokens.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][tokens]
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    per_layer = []
    for blk in params["blocks"]:
        xa = L._rms_norm(x, blk["ln1"])
        q = L._mm(xa, blk["wq"], interpret).reshape(b, s, h, hd).swapaxes(1, 2)
        k = L._mm(xa, blk["wk"], interpret).reshape(b, s, hk, hd).swapaxes(1, 2)
        v = L._mm(xa, blk["wv"], interpret).reshape(b, s, hk, hd).swapaxes(1, 2)
        q = L._rope(q, pos, cfg.rope_theta)
        k = L._rope(k, pos, cfg.rope_theta)
        o = L._attn_prefill(q, k, v, "int8", interpret, window=cfg.window_size,
                            sink=cfg.sink_size)
        x = x + L._mm(o.swapaxes(1, 2).reshape(b, s, -1).astype(x.dtype), blk["wo"], interpret)
        xm = L._rms_norm(x, blk["ln2"])
        x = x + L._mm(jax.nn.silu(L._mm(xm, blk["w1"], interpret)), blk["w2"], interpret)

        kq, ks = jax.vmap(
            functools.partial(dec.quantize_token, bits=kv_bits[0]),
            in_axes=2, out_axes=2)(k)  # [1,Hk,S,dk], [1,Hk,S]
        vq, vs = jax.vmap(
            functools.partial(dec.quantize_token, bits=kv_bits[1]),
            in_axes=2, out_axes=2)(v)
        per_layer.append((kq[0], ks[0], vq[0], vs[0]))

    logits = L._rms_norm(x[:, -1], params["ln_f"]) @ params["embed"].T
    return logits[0], per_layer


def _decode_step(
    params: Params,
    caches: List[dict],
    tokens: jax.Array,  # [B] int32 — the token being fed to each slot
    lengths: jax.Array,  # [B] int32 — stored tokens INCLUDING the new one
    page_table: jax.Array,  # [B, W] int32
    active: jax.Array,  # [B] bool
    *,
    cfg: L.LLMConfig,
    page_size: int,
    kv_bits: Tuple[int, int],
    interpret: Optional[bool],
) -> Tuple[jax.Array, List[dict]]:
    """One batched decode step: write each active slot's new-token quantized
    K/V into its page, run the paged decode kernel, return logits. Exactly
    the T=1 case of :func:`_spec_decode_step` — ONE transformer-step body
    exists, so the speculative path's token-identical-to-plain guarantee is
    structural, not coincidental."""
    logits, new_caches = _spec_decode_step(
        params, caches, tokens[:, None], lengths, page_table, active,
        cfg=cfg, page_size=page_size, kv_bits=kv_bits, interpret=interpret,
    )
    return logits[:, 0], new_caches


def _spec_decode_step(
    params: Params,
    caches: List[dict],
    tokens: jax.Array,  # [B, T] int32 — fed token + n-gram drafts per slot
    lengths: jax.Array,  # [B] int32 — stored tokens INCLUDING all T new
    page_table: jax.Array,  # [B, W] int32
    active: jax.Array,  # [B] bool
    *,
    cfg: L.LLMConfig,
    page_size: int,
    kv_bits: Tuple[int, int],
    interpret: Optional[bool],
) -> Tuple[jax.Array, List[dict]]:
    """Speculative-verify twin of :func:`_decode_step`: write T tokens'
    quantized K/V per slot, run the MULTI-TOKEN paged decode kernel
    (ops/decode.py ``q_tokens`` — the T queries ride the sublane rows, so
    verification costs one cache stream), return logits ``[B, T, vocab]``
    where row t scores the successor of fed token t."""
    b, t = tokens.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    n_pages = caches[0]["k"].shape[1]
    x = params["embed"][tokens]  # [B,T,D]
    pos = lengths[:, None] - t + jnp.arange(t)[None, :]  # [B,T]
    kv_lengths = jnp.where(active, lengths, 0)
    page_idx = jnp.clip(pos // page_size, 0, page_table.shape[1] - 1)
    pid = jnp.where(
        active[:, None], page_table[jnp.arange(b)[:, None], page_idx], n_pages
    )  # [B,T]; inactive slots scatter to an out-of-range page id -> dropped
    off = jnp.clip(pos, 0, None) % page_size

    new_caches = []
    for blk, cache in zip(params["blocks"], caches):
        xa = L._rms_norm(x, blk["ln1"])
        q = L._mm(xa, blk["wq"], interpret).reshape(b, t, h, hd).swapaxes(1, 2)
        k = L._mm(xa, blk["wk"], interpret).reshape(b, t, hk, hd).swapaxes(1, 2)
        v = L._mm(xa, blk["wv"], interpret).reshape(b, t, hk, hd).swapaxes(1, 2)
        q = L._rope(q, pos, cfg.rope_theta)  # [B,H,T,hd]
        k = L._rope(k, pos, cfg.rope_theta)  # [B,Hk,T,hd]
        kq, ks = dec.quantize_token(k.swapaxes(1, 2), bits=kv_bits[0])  # [B,T,Hk,dk]
        vq, vs = dec.quantize_token(v.swapaxes(1, 2), bits=kv_bits[1])
        cache = {
            "k": cache["k"].at[:, pid, off].set(
                kq.transpose(2, 0, 1, 3), mode="drop"
            ),
            "v": cache["v"].at[:, pid, off].set(
                vq.transpose(2, 0, 1, 3), mode="drop"
            ),
            "k_scale": cache["k_scale"].at[:, pid, off].set(
                ks.transpose(2, 0, 1), mode="drop"
            ),
            "v_scale": cache["v_scale"].at[:, pid, off].set(
                vs.transpose(2, 0, 1), mode="drop"
            ),
        }
        o = dec.decode_attention(
            q.swapaxes(1, 2),  # [B,T,H,hd]
            cache["k"],
            cache["v"],
            cache["k_scale"],
            kv_lengths,
            v_scale=cache["v_scale"],
            page_table=page_table,
            k_bits=kv_bits[0],
            v_bits=kv_bits[1],
            block_kv=page_size,
            window_size=cfg.window_size,
            sink_size=cfg.sink_size,
            interpret=interpret,
        )  # [B,T,H,hd]
        x = x + L._mm(o.reshape(b, t, -1).astype(x.dtype), blk["wo"], interpret)
        xm = L._rms_norm(x, blk["ln2"])
        x = x + L._mm(jax.nn.silu(L._mm(xm, blk["w1"], interpret)), blk["w2"], interpret)
        new_caches.append(cache)

    logits = L._rms_norm(x, params["ln_f"]) @ params["embed"].T  # [B,T,vocab]
    return logits, new_caches


def _multi_decode_steps(
    params: Params,
    caches: List[dict],
    tokens: jax.Array,  # [B] int32 — token being fed at the segment start
    lengths0: jax.Array,  # [B] int32 — stored tokens BEFORE the segment
    page_table: jax.Array,  # [B, W] int32 (pages for all n steps pre-allocated)
    active: jax.Array,  # [B] bool
    *,
    n: int,
    cfg: L.LLMConfig,
    page_size: int,
    kv_bits: Tuple[int, int],
    interpret: Optional[bool],
) -> Tuple[jax.Array, List[dict]]:
    """``n`` batched decode steps as ONE ``lax.scan`` (greedy argmax feeds
    back on device) — the serving twin of ``models/llm.decode_tokens``.
    Step i runs exactly :func:`_decode_step` with ``lengths0 + i + 1``, so
    the emitted stream is token-identical to ``n`` single ticks. Returns
    (tokens ``[B, n]``, caches)."""

    def body(carry, i):
        toks, cs = carry
        logits, cs = _decode_step(
            params, cs, toks, lengths0 + i + 1, page_table, active,
            cfg=cfg, page_size=page_size, kv_bits=kv_bits,
            interpret=interpret,
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cs), nxt

    (_, caches), toks = jax.lax.scan(
        body, (tokens.astype(jnp.int32), caches), jnp.arange(n)
    )
    return jnp.swapaxes(toks, 0, 1), caches


def _decode_sample_step(params, caches, tokens, lengths, page_table, active,
                        *, cfg, page_size, kv_bits, interpret):
    """:func:`_decode_step` + greedy argmax in ONE jitted program (async
    scheduling): the sampled tokens come out of the same XLA computation
    that donates the caches, so no host-side standalone op can race the
    donation (observed: a separate `jnp.argmax` dispatched between two
    donating decode calls intermittently read corrupted logits on the CPU
    backend — 1-in-5 divergence, gone with in-program sampling)."""
    logits, caches = _decode_step(
        params, caches, tokens, lengths, page_table, active,
        cfg=cfg, page_size=page_size, kv_bits=kv_bits, interpret=interpret,
    )
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches


class _NgramIndex:
    """Prompt-lookup drafting index (the draft-model-free speculation vLLM
    ships as 'ngram'): for the token history's current n-token suffix, find
    the most recent PREVIOUS occurrence and propose the tokens that
    followed it. Incremental — O(1) dict work per appended token — so
    drafting cost stays flat at 128K-class histories instead of rescanning
    the whole history every tick."""

    def __init__(self, n: int):
        self.n = n
        self.toks: List[int] = []
        self._last: Dict[tuple, int] = {}  # gram -> most recent start
        self._prev: Dict[tuple, int] = {}  # gram -> start BEFORE _last

    def extend(self, toks) -> None:
        for t in toks:
            self.toks.append(int(t))
            i = len(self.toks)
            if i >= self.n:
                g = tuple(self.toks[i - self.n :])
                if g in self._last:
                    self._prev[g] = self._last[g]
                self._last[g] = i - self.n

    def draft(self, k: int) -> List[int]:
        if len(self.toks) < self.n:
            return []
        g = tuple(self.toks[-self.n :])
        s = self._prev.get(g)
        if s is None:
            return []
        return self.toks[s + self.n : s + self.n + k]


def _scatter_pages_body(
    caches: List[dict],
    per_layer: List[tuple],  # (kq [Hk,S,dk], ks [Hk,S], vq, vs) per layer
    pids: jax.Array,  # [n_pages] int32 — destination pages, in order
    page_size: int,
) -> List[dict]:
    """Scatter per-token quantized KV rows (starting at a page boundary)
    into their pages; shared by the one-shot prefill scatter and the
    budgeted chunked-prefill step."""
    n = pids.shape[0]
    new = []
    for c, (kq, ks, vq, vs) in zip(caches, per_layer):
        hk, s_rows = kq.shape[0], kq.shape[1]
        pad = n * page_size - s_rows

        def as_pages(x, pad=pad, hk=hk, n=n):
            x = jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2))
            return x.reshape((hk, n, page_size) + x.shape[2:])

        new.append({
            "k": c["k"].at[:, pids].set(as_pages(kq)),
            "v": c["v"].at[:, pids].set(as_pages(vq)),
            "k_scale": c["k_scale"].at[:, pids].set(as_pages(ks)),
            "v_scale": c["v_scale"].at[:, pids].set(as_pages(vs)),
        })
    return new


def _budgeted_prefill_chunk(
    params: Params,
    caches: List[dict],
    toks_c: jax.Array,  # [1, sc] — this chunk's prompt tokens
    prefix_pids: jax.Array,  # [n_pre] int32 — already-written pages, in order
    dest_pids: jax.Array,  # [ceil(sc/page)] int32 — this chunk's pages
    prefix_valid: Optional[jax.Array] = None,  # true prefix rows (bucketed)
    *,
    cfg: L.LLMConfig,
    page_size: int,
    kv_bits: Tuple[int, int],
    interpret: Optional[bool],
) -> Tuple[jax.Array, List[dict]]:
    """One budget-sized slice of an admitted prompt's prefill, as ONE jitted
    donated device program: gather the request's already-prefilled pages as
    prefix KV, run the chunk's causal self-attention + cross-attention over
    that prefix (LSE-merged — serving twin of models/llm._prefill_chunk),
    and scatter the chunk's quantized rows into its own pages. Returns the
    chunk's last-token logits (consumed only by the final chunk) and the
    updated caches. Compiles per (n_pre, sc) shape pair; the engine's
    budgeted path pads the prefix gather to power-of-two page counts with
    ``prefix_valid`` masking the pad rows exactly (segment ids), so a long
    prompt compiles O(log pages) variants, not one per chunk — and bucket
    PROMPT lengths as real engines do (bench/serving_bench.make_workload).

    Role: the Sarathi-Serve stall-free admission schedule the reference
    delegates to its external sglang runtime
    (reference src/triton/utils/main.py:14-15)."""
    n_pre = prefix_pids.shape[0]
    if n_pre:
        s_pre = n_pre * page_size
        prefix_kv = []
        for c in caches:
            hk = c["k"].shape[0]
            prefix_kv.append((
                c["k"][:, prefix_pids].reshape(hk, s_pre, -1),
                c["k_scale"][:, prefix_pids].reshape(hk, s_pre),
                c["v"][:, prefix_pids].reshape(hk, s_pre, -1),
                c["v_scale"][:, prefix_pids].reshape(hk, s_pre),
            ))
        logits, per_layer = _chunked_prefill_forward(
            params, toks_c, prefix_kv, s_pre, cfg, kv_bits, interpret,
            prefix_valid=prefix_valid,
        )
    else:
        logits, per_layer = _prefill_forward(
            params, toks_c, cfg, kv_bits, interpret
        )
    return logits, _scatter_pages_body(caches, per_layer, dest_pids, page_size)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_pages(caches: List[dict], payload: List[dict], pids: jax.Array):
    """Write page-shaped payload ([Hk, n, page, ...] per field) back into the
    paged caches (the preemption-resume restore path)."""
    return [
        {name: c[name].at[:, pids].set(p[name]) for name in c}
        for c, p in zip(caches, payload)
    ]


@functools.lru_cache(maxsize=64)
def _shared_jit(kind: str, cfg: L.LLMConfig, page_size: int,
                kv_bits: Tuple[int, int], interpret: Optional[bool]):
    """Process-wide cache of the engine's jitted step programs keyed by
    their static configuration: every ServingEngine with the same (model
    cfg, page size, cache bits, interpret) SHARES compiled executables
    instead of recompiling per engine instance — engine construction is
    cheap, and multi-engine processes (benches, A/B serving, rebuild-on-
    config) skip the per-engine re-warmup that used to dominate their
    walls. LLMConfig is a frozen (hashable) dataclass, so it keys
    directly; donation stays per-call and is unaffected by sharing."""
    fns = {
        "decode": _decode_step,
        "decode_sample": _decode_sample_step,
        "multi": _multi_decode_steps,
        "spec": _spec_decode_step,
        "chunk_prefill": _budgeted_prefill_chunk,
    }
    kw = {"static_argnames": ("n",)} if kind == "multi" else {}
    return jax.jit(
        functools.partial(fns[kind], cfg=cfg, page_size=page_size,
                          kv_bits=kv_bits, interpret=interpret),
        donate_argnums=(1,), **kw)


class ServingEngine:
    """Single-host continuous-batching engine for the in-repo LLM.

    >>> eng = ServingEngine(params, cfg, ServingConfig(page_size=8))
    >>> rid = eng.add_request([1, 2, 3], max_new_tokens=16)
    >>> done = eng.run()           # or eng.step() in a service loop
    >>> done[rid]                  # generated token ids
    """

    def __init__(
        self,
        params: Params,
        cfg: L.LLMConfig,
        scfg: ServingConfig = ServingConfig(),
        *,
        interpret: Optional[bool] = None,
    ):
        assert cfg.num_heads % cfg.num_kv_heads == 0
        self.params = params
        self.cfg = cfg
        self.scfg = scfg
        self.interpret = interpret
        if scfg.admission not in ("reserve", "lazy"):
            raise ValueError("admission must be 'reserve' or 'lazy'")
        if cfg.window_size is not None and scfg.admission == "lazy":
            # Rolling trim leaves -1 holes in a windowed request's logical
            # page table; lazy admission's preemption/resume path would
            # re-allocate the FULL hole-free logical length (potentially
            # larger than the whole pool — the exact regime trimming
            # exists for) and corrupt the capped-reservation ledger.
            # Windowed reservations are already small (capped at
            # sink + window + slop in add_request), so reserve admission
            # keeps the lazy mode's concurrency benefit without needing
            # preemption at all.
            raise ValueError(
                "sliding-window models require admission='reserve' "
                "(rolling page reclamation replaces lazy admission's "
                "preemption as the memory-bound mechanism)"
            )
        self.sched = host.Scheduler(
            scfg.num_pages, scfg.page_size, scfg.max_batch,
            lazy=scfg.admission == "lazy",
        )
        # Sliding-window models disable prefix caching: the chunked-prefill
        # LSE merge computes FULL cross-attention over cached prefix pages,
        # which would break the (q - W, q] window semantics at the chunk
        # boundary. (Rolling-window page reclamation is the future fix.)
        self.prefix_cache = (
            PrefixCache(self.sched, scfg.page_size)
            if scfg.prefix_caching and cfg.window_size is None
            else None
        )
        self._shared: Dict[int, int] = {}  # rid -> shared page count
        self.caches = _empty_paged_caches(cfg, scfg)
        b, w = scfg.max_batch, scfg.table_width
        self._table = np.zeros((b, w), np.int32)
        self._lengths = np.zeros((b,), np.int32)
        self._active = np.zeros((b,), bool)
        self._slot_rid = np.full((b,), -1, np.int32)
        self._next_tok = np.zeros((b,), np.int32)
        self._prompts: Dict[int, np.ndarray] = {}
        self._waiting_rids: List[int] = []
        self._max_new: Dict[int, int] = {}
        self._eos: Dict[int, Optional[int]] = {}
        self.outputs: Dict[int, List[int]] = {}
        self._finished: Dict[int, List[int]] = {}
        # preempted (swapped-out) requests: rid -> saved private-page payload
        self._paused: Dict[int, dict] = {}
        self._admit_order: List[int] = []  # running rids, oldest first
        self.preemptions = 0
        # EVERY prefill — blocking one-shot, prefix-cache hit, and
        # budgeted chunk — runs through ONE jitted donated device program
        # per shape (_budgeted_prefill_chunk: gather the already-written
        # prefix pages, forward the suffix with LSE merge, scatter the new
        # quantized rows into their pages). The r4 engine dispatched the
        # admission forward op-by-op, which dispatch-priced transports
        # charge at ~0.5-2 s per admission, and an intermediate r5 version
        # still gathered prefix pages eagerly (~0.2-0.4 s per cache hit —
        # measured as a prefix-cache LOSS on the fast transport). The
        # blocking path is simply one unbounded chunk, so blocking and
        # budgeted prefills cannot drift numerically. Bucketed prompt
        # lengths keep the per-shape compile count bounded — exactly why
        # real engines bucket prefill (bench/serving_bench.make_workload).
        kbits = (scfg.eff_k_bits, scfg.eff_v_bits)
        self._chunk_prefill = _shared_jit(
            "chunk_prefill", cfg, scfg.page_size, kbits, interpret)
        # Budgeted chunked-prefill scheduling (stall-free admissions).
        self._budget: Optional[int] = None
        self._prefilling: "collections.OrderedDict[int, int]" = (
            collections.OrderedDict()  # rid -> prompt tokens prefilled so far
        )
        self._prefilling_shared: Dict[int, int] = {}  # rid -> shared pages
        if scfg.prefill_budget is not None:
            if scfg.prefill_budget <= 0:
                raise ValueError("prefill_budget must be positive")
            if scfg.admission != "reserve":
                raise ValueError(
                    "prefill_budget requires admission='reserve' (a "
                    "half-prefilled request holds pages but is not "
                    "preemptible)")
            self._budget = (
                -(-scfg.prefill_budget // scfg.page_size) * scfg.page_size
            )
        self._decode = _shared_jit(
            "decode", cfg, scfg.page_size, kbits, interpret)
        self._async = scfg.async_fetch
        if self._async:
            if scfg.admission != "reserve":
                raise ValueError("async_fetch requires admission='reserve'")
            if scfg.spec_ngram > 0 or scfg.multi_step > 1:
                raise ValueError(
                    "async_fetch excludes spec_ngram/multi_step (both need "
                    "token values per tick)")
        self._next_tok_dev = None  # device-resident next tokens (async mode)
        self._pending: List[tuple] = []  # (slot->rid map, device tokens)
        self._out_count: Dict[int, int] = {}  # async: emitted-token counts
        self._decode_sample = None
        if self._async:
            self._decode_sample = _shared_jit(
                "decode_sample", cfg, scfg.page_size, kbits, interpret)
        self._multi = None
        self.multi_segments = 0
        if scfg.multi_step > 1:
            if scfg.admission != "reserve":
                raise ValueError("multi_step requires admission='reserve'")
            if scfg.spec_ngram > 0:
                raise ValueError("multi_step and spec_ngram are exclusive")
            self._multi = _shared_jit(
                "multi", cfg, scfg.page_size, kbits, interpret)
        self._spec_decode = None
        self.spec_rounds = self.spec_accepted = 0
        if scfg.spec_ngram > 0:
            if scfg.admission != "reserve":
                # The lazy path's page-pressure relief budgets ONE appended
                # token per slot per tick; speculative steps append spec_k.
                raise ValueError("spec_ngram requires admission='reserve'")
            if scfg.spec_k < 2:
                raise ValueError("spec_k must be >= 2 (room for >= 1 draft)")
            self._ngram: Dict[int, _NgramIndex] = {}
            self._spec_decode = _shared_jit(
                "spec", cfg, scfg.page_size, kbits, interpret)

    # -- request intake ----------------------------------------------------

    def add_request(
        self,
        prompt_tokens: Sequence[int],
        max_new_tokens: int,
        eos_token: Optional[int] = None,
    ) -> int:
        """Queue a request. ``eos_token``: stop early when the model emits
        it (the token is included in the output). Works on every decode
        path — single ticks, speculative verify, and multi-step segments.
        An eos hit always RETIRES the request immediately, releasing its
        slot and pages; rows appended past the stop inside a speculative
        or multi-step batch die with the release and are never read (they
        are NOT rolled back in place — do not keep a post-eos request's
        cache)."""
        prompt = np.asarray(prompt_tokens, np.int32)
        assert prompt.ndim == 1 and prompt.size > 0
        if eos_token is not None and self._async:
            raise ValueError("eos_token needs per-tick token values; "
                             "disable async_fetch for stop-token requests")
        # Speculative steps transiently append up to spec_k rows beyond the
        # final accepted length — reserve (and table-width) the overshoot.
        spec_slack = self.scfg.spec_k if self.scfg.spec_ngram > 0 else 0
        need_w = -(
            -(prompt.size + max_new_tokens + spec_slack - 1) // self.scfg.page_size
        )
        if need_w > self.scfg.table_width:
            raise MemoryError("request exceeds the static page-table width")
        shared: List[int] = []
        if self.prefix_cache is not None:
            # cap: at least one prompt token must stay uncached (it provides
            # the first-token logits, and keeps shared pages read-only)
            shared = self.prefix_cache.lookup(
                prompt, (prompt.size - 1) // self.scfg.page_size
            )
        max_new_sched = int(max_new_tokens)
        if self.cfg.window_size is not None:
            # Rolling page reclamation bounds a windowed sequence's LIVE
            # pages at sink + window (+ partial-page slop) regardless of
            # how long it generates — cap the scheduler-side worst-case
            # reservation accordingly so "generate forever" admits into a
            # finite pool. (The logical table width still covers the full
            # length; trimmed logicals become holes.)
            # +multi_step: a segment pre-appends up to multi_step rows and
            # trims only below the segment's FIRST position (conservative
            # spec_slack trim), so the live-page bound grows by a segment
            cap = (self.cfg.sink_size + self.cfg.window_size
                   + 3 * self.scfg.page_size + self.scfg.multi_step)
            max_new_sched = max(1, min(max_new_sched, cap))
        rid = self.sched.add(int(prompt.size), max_new_sched + spec_slack, shared)
        if self._spec_decode is not None:
            self._ngram[rid] = _NgramIndex(self.scfg.spec_ngram)
            self._ngram[rid].extend(prompt)
        self._shared[rid] = len(shared)
        self._waiting_rids.append(rid)
        self._prompts[rid] = prompt
        self._max_new[rid] = int(max_new_tokens)
        self._eos[rid] = None if eos_token is None else int(eos_token)
        self.outputs[rid] = []
        return rid

    # -- lifecycle ---------------------------------------------------------

    def _prefill(self, rid: int) -> None:
        """Blocking one-shot prefill = ONE unbounded chunk through the same
        jitted gather+forward+scatter program the budgeted path uses (a
        cache hit's shared pages are the chunk's prefix pages), so the
        blocking and budgeted paths cannot drift numerically and a cache
        hit costs one device dispatch (the earlier eager prefix-page
        gather was measured a 0.2-0.4 s/admission loss on the relay)."""
        prompt = self._prompts.pop(rid)
        self._waiting_rids.remove(rid)
        pages = self.sched.page_table(rid)
        n_shared = self._shared.pop(rid, 0)
        s_pre = n_shared * self.scfg.page_size
        logits, self.caches = self._chunk_prefill(
            self.params,
            self.caches,
            jnp.asarray(prompt[s_pre:])[None],
            jnp.asarray(pages[:n_shared], jnp.int32),
            jnp.asarray(pages[n_shared:], jnp.int32),
        )
        self._finish_prefill(rid, logits, prompt, pages, n_shared)

    def _finish_prefill(self, rid, logits, prompt, pages, n_shared) -> None:
        """Prefill-completion bookkeeping shared by the blocking and
        budgeted paths (ONE copy, so the two cannot drift): hit/miss
        accounting, prefix-page registration, first-token sampling, n-gram
        history, retire-or-seat."""
        p = self.scfg.page_size
        if self.prefix_cache is not None:
            self.prefix_cache.hits += n_shared
            self.prefix_cache.misses += max(
                0, min(prompt.size // p, (prompt.size - 1) // p) - n_shared
            )
            self.prefix_cache.register(prompt, pages)
        slot = self.sched.info(rid)["slot"]
        tok = int(np.asarray(jnp.argmax(logits)))
        self.outputs[rid].append(tok)
        self._out_count[rid] = 1
        if self._spec_decode is not None:
            # The draft history must track prompt + EVERY emitted token —
            # including this prefill-sampled one — or the n-gram key is
            # misaligned at the prompt/generation boundary forever.
            self._ngram[rid].extend([tok])
        if self._done(rid):
            self._retire(rid, slot)
            return
        self._seat(rid, slot, tok, prompt.size, pages)

    def _begin_prefill(self, rid: int) -> None:
        """Move an admitted request into the PREFILLING state (budgeted
        mode): its pages and slot are allocated, but its prompt runs through
        :meth:`_prefill_chunk_tick` one budget-sized chunk per tick instead
        of blocking this admission tick on the whole prefill. Cache-hit
        prefix pages count as already done."""
        self._waiting_rids.remove(rid)
        n_shared = self._shared.pop(rid, 0)
        self._prefilling_shared[rid] = n_shared
        self._prefilling[rid] = n_shared * self.scfg.page_size

    def _prefill_progress(self) -> None:
        """Advance prefilling prompts: with live decode slots, exactly ONE
        chunk dispatch per tick (oldest admission first) so decode never
        stalls; with an idle batch, chunks run back-to-back until a request
        seats — a solo long prompt keeps the blocking engine's TTFT."""
        if not self._prefilling:
            return
        if self._active.any():
            self._prefill_chunk_tick(next(iter(self._prefilling)))
            return
        while self._prefilling and not self._active.any():
            self._prefill_chunk_tick(next(iter(self._prefilling)))

    def _prefill_chunk_tick(self, rid: int) -> None:
        """Run one chunk of ``rid``'s prefill; on the final chunk, sample
        the first token and seat the request (mirrors :meth:`_prefill`'s
        completion bookkeeping)."""
        p = self.scfg.page_size
        done = self._prefilling[rid]
        prompt = self._prompts[rid]
        sc = min(self._budget, prompt.size - done)
        pages = self.sched.page_table(rid)
        j0 = done // p  # chunks end on page boundaries, so done is aligned
        n_dest = -(-sc // p)
        # Bucket the prefix gather to the next power of two (pad pids with
        # an arbitrary allocated page; pad rows are excluded exactly by the
        # kernel's segment mask and positions use the true `done`): the
        # chunk program compiles per (bucket, sc) pair — O(log pages)
        # variants for a long prompt instead of one per chunk (a 128K
        # prompt at a 4K budget would otherwise compile 32 programs).
        if self.cfg.window_size is None:
            nb = j0 if j0 == 0 else 1 << (j0 - 1).bit_length()
            prefix_pids = pages[:j0] + [pages[0]] * (nb - j0)
            pv = jnp.asarray(done, jnp.int32) if j0 else None
        else:
            # windowed chunks: exact prefix (the band's static
            # q_position_offset is the prefix length) — the banded grid
            # skips below-window prefix blocks, so compute stays O(W)
            prefix_pids, pv = pages[:j0], None
        logits, self.caches = self._chunk_prefill(
            self.params,
            self.caches,
            jnp.asarray(prompt[done : done + sc])[None],
            jnp.asarray(prefix_pids, jnp.int32),
            jnp.asarray(pages[j0 : j0 + n_dest], jnp.int32),
            pv,
        )
        done += sc
        if done < prompt.size:
            self._prefilling[rid] = done
            return
        del self._prefilling[rid]
        prompt = self._prompts.pop(rid)
        n_shared = self._prefilling_shared.pop(rid)
        self._finish_prefill(rid, logits, prompt, pages, n_shared)

    def _seat(self, rid: int, slot: int, next_tok: int, length: int,
              pages: Sequence[int]) -> None:
        self._slot_rid[slot] = rid
        self._active[slot] = True
        self._next_tok[slot] = next_tok
        if self._async and self._next_tok_dev is not None:
            self._next_tok_dev = self._next_tok_dev.at[slot].set(next_tok)
        self._lengths[slot] = length
        row = np.zeros((self.scfg.table_width,), np.int32)
        row[: len(pages)] = pages
        self._table[slot] = row
        self._admit_order.append(rid)

    def _preempt(self, rid: int) -> None:
        """Swap a running request out: save its private pages' KV payload to
        host memory, release its slot/pages, re-queue it at the front."""
        slot = int(np.nonzero(self._slot_rid == rid)[0][0])
        pages = self.sched.page_table(rid)
        n_shared = self.sched.info(rid)["shared"]
        priv = np.asarray(pages[n_shared:], np.int32)
        # Trim holes (-1) cannot appear here: windowed engines run reserve
        # admission (enforced in __init__), which never preempts. A -1
        # would silently gather another sequence's page into the payload.
        assert priv.size == 0 or priv.min() >= 0, "preempt saw trimmed holes"
        saved = jax.device_get([
            {name: c[name][:, priv] for name in c} for c in self.caches
        ])
        self.sched.preempt(rid)
        self._paused[rid] = {
            "payload": saved,
            "next_tok": int(self._next_tok[slot]),
            "n_shared": n_shared,
        }
        self._slot_rid[slot] = -1
        self._active[slot] = False
        self._lengths[slot] = 0
        self._admit_order.remove(rid)
        self.preemptions += 1

    def _resume(self, rid: int) -> None:
        """Re-admit a preempted request: restore its saved KV payload into
        the freshly allocated pages (bit-exact, so generation continues as
        if never interrupted)."""
        rec = self._paused.pop(rid)
        info = self.sched.info(rid)
        pages = self.sched.page_table(rid)
        priv = jnp.asarray(pages[rec["n_shared"]:], jnp.int32)
        payload = jax.device_put(rec["payload"])
        self.caches = _write_pages(self.caches, payload, priv)
        self._seat(rid, info["slot"], rec["next_tok"], info["length"], pages)

    def _done(self, rid: int) -> bool:
        out = self.outputs[rid]
        if len(out) >= self._max_new[rid]:
            return True
        eos = self._eos.get(rid)
        return eos is not None and bool(out) and out[-1] == eos

    def _retire(self, rid: int, slot: int) -> None:
        self._out_count.pop(rid, None)
        self._eos.pop(rid, None)
        self.sched.release(rid)
        if self._spec_decode is not None:
            self._ngram.pop(rid, None)
        self._finished[rid] = self.outputs[rid]
        if rid in self._admit_order:
            self._admit_order.remove(rid)
        if self._slot_rid[slot] == rid:
            self._slot_rid[slot] = -1
            self._active[slot] = False
            self._lengths[slot] = 0

    def cancel_request(self, rid: int) -> List[int]:
        """Abort a request in any pre-finished state; returns the tokens it
        generated so far. WAITING requests leave the queue (their shared-page
        pins drop, so an abandoned head request cannot block FIFO admission);
        PREEMPTED requests also drop their saved payload; RUNNING requests
        release their slot and pages."""
        if rid in self._finished:
            return self._finished[rid]
        self._drain_pending()  # async mode: materialize before returning
        if rid in self._prefilling:  # admitted, mid-chunked-prefill
            # The scheduler sees a RUNNING request (slot + pages allocated
            # at admission): release, not cancel. Partially-written pages
            # return to the pool unregistered (never cached).
            self.sched.release(rid)
            del self._prefilling[rid]
            del self._prompts[rid]
            self._prefilling_shared.pop(rid, None)
        elif rid in self._prompts:  # waiting, never prefilled
            self.sched.cancel(rid)
            self._waiting_rids.remove(rid)
            del self._prompts[rid]
            self._shared.pop(rid, None)
        elif rid in self._paused:  # preempted (waiting with swapped-out KV)
            self.sched.cancel(rid)
            del self._paused[rid]
        elif rid in self._slot_rid:  # running
            slot = int(np.nonzero(self._slot_rid == rid)[0][0])
            self.sched.release(rid)
            self._admit_order.remove(rid)
            self._slot_rid[slot] = -1
            self._active[slot] = False
            self._lengths[slot] = 0
        else:
            raise ValueError(f"unknown rid {rid}")
        toks = self.outputs.get(rid, [])
        if self._spec_decode is not None:
            self._ngram.pop(rid, None)
        self._finished[rid] = toks
        self._max_new.pop(rid, None)
        self._eos.pop(rid, None)
        return toks

    def step(self) -> Dict[int, List[int]]:
        """One engine tick: admit+prefill, then one batched decode step.
        Returns requests that finished during this tick."""
        done_before = set(self._finished)
        if self.prefix_cache is not None:
            # Re-resolve sharing for waiting requests: prompts prefilled
            # since they were queued may now cover their prefixes.
            for rid in self._waiting_rids:
                pids = self.prefix_cache.lookup(
                    self._prompts[rid],
                    (self._prompts[rid].size - 1) // self.scfg.page_size,
                )
                if len(pids) != self._shared[rid]:
                    self.sched.update_shared(rid, pids)
                    self._shared[rid] = len(pids)
        st = self.sched.step()
        admitted = list(st["admitted"])
        # Under page pressure, evict LRU prefix-cache pins until the FIFO
        # head admits (or no evictable entry remains / we're blocked on
        # slots). evict_one only evicts entries whose page actually frees,
        # so each iteration makes progress by construction.
        while st["waiting"] and self.prefix_cache is not None:
            if self.sched.stats()["used_slots"] >= self.scfg.max_batch:
                break
            if not self.prefix_cache.evict_one():
                break
            st = self.sched.step()
            admitted += st["admitted"]
        for rid in admitted:
            if rid in self._paused:
                self._resume(rid)
            elif self._budget is not None:
                self._begin_prefill(rid)
            else:
                self._prefill(rid)
        if self._budget is not None:
            self._prefill_progress()

        slots = np.nonzero(self._active)[0]
        if slots.size and self.scfg.admission == "lazy":
            slots = self._relieve_page_pressure(slots)
        n_seg = 0
        if (slots.size and self._multi is not None
                and (not self._prompts or self._budget is not None)
                and not self._paused):
            # Segments engage only with an EMPTY queue (the steady serving
            # regime, where they win 2.52x — SERVING_TPU.json). Running
            # them merely when admission is BLOCKED was measured a net
            # loss on prefill-heavy mixed workloads (0.91x: dispatches
            # 239 -> 73 but each segment delays the next admission check
            # by its device time, costing occupancy). With budgeted
            # chunked prefill the gate relaxes: a waiting prompt no longer
            # implies a blocking prefill — admissions and one prefill
            # chunk still run at every segment boundary. Segment length
            # ladder: the largest power of two <= min(remaining,
            # multi_step), so runs with heterogeneous or draining budgets
            # still segment; at most log2(multi_step) compiled variants.
            min_rem = min(
                self._max_new[int(self._slot_rid[s])]
                - len(self.outputs[int(self._slot_rid[s])])
                for s in slots
            )
            n_seg = min(self.scfg.multi_step, min_rem)
            n_seg = 1 << (max(n_seg, 1).bit_length() - 1)  # floor pow2
        if n_seg >= 2:
            self._step_multi(slots, n_seg)
        elif slots.size and self._spec_decode is not None:
            self._step_speculative(slots)
        elif slots.size:
            for slot in slots:
                rid = int(self._slot_rid[slot])
                new_len = self.sched.append_token(rid)
                assert new_len > 0, "page pressure relief failed"
                self._lengths[slot] = new_len
                self._update_slot_table(slot, rid, new_len)
            if self._async:
                if self._next_tok_dev is None:
                    self._next_tok_dev = jnp.asarray(self._next_tok)
                # COPY the host-side scheduler arrays at dispatch: on the
                # CPU backend jnp.asarray aliases numpy memory zero-copy,
                # and async mode mutates these arrays for the NEXT tick
                # while the in-flight computation still reads them (the
                # sync path never races because its value fetch serializes
                # every tick; observed 1-in-5 token corruption without the
                # copies).
                nxt, self.caches = self._decode_sample(
                    self.params,
                    self.caches,
                    self._next_tok_dev,
                    jnp.asarray(self._lengths.copy()),
                    jnp.asarray(self._table.copy()),
                    jnp.asarray(self._active.copy()),
                )
                self._next_tok_dev = nxt  # feeds the next tick, no fetch
                slot_rids = {int(sl): int(self._slot_rid[sl]) for sl in slots}
                self._pending.append((slot_rids, nxt))
                if any(
                    self._out_count[rid] + 1 >= self._max_new[rid]
                    for rid in slot_rids.values()
                ):
                    # a retirement is due: materialize values (ONE batched
                    # fetch for every deferred tick), then retire by value
                    self._drain_pending()
                    for sl, rid in slot_rids.items():
                        if len(self.outputs[rid]) >= self._max_new[rid]:
                            self._retire(rid, sl)
                        else:
                            self._next_tok[sl] = self.outputs[rid][-1]
                else:
                    for rid in slot_rids.values():
                        self._out_count[rid] += 1
            else:
                logits, self.caches = self._decode(
                    self.params,
                    self.caches,
                    jnp.asarray(self._next_tok),
                    jnp.asarray(self._lengths),
                    jnp.asarray(self._table),
                    jnp.asarray(self._active),
                )
                toks = np.asarray(jnp.argmax(logits, axis=-1))
                for slot in slots:
                    rid = int(self._slot_rid[slot])
                    tok = int(toks[slot])
                    self.outputs[rid].append(tok)
                    if self._done(rid):
                        self._retire(rid, slot)
                    else:
                        self._next_tok[slot] = tok
        return {r: t for r, t in self._finished.items() if r not in done_before}

    def _drain_pending(self) -> None:
        """Materialize every deferred tick's tokens (async_fetch) with one
        batched device fetch and append them to the owning requests."""
        if not self._pending:
            return
        toks_host = jax.device_get([t for _, t in self._pending])
        for (slot_rids, _), tok in zip(self._pending, toks_host):
            for sl, rid in slot_rids.items():
                self.outputs[rid].append(int(tok[sl]))
                self._out_count[rid] = len(self.outputs[rid])
        self._pending.clear()

    def _update_slot_table(self, slot: int, rid: int, new_len: int,
                           spec_slack: int = 0) -> None:
        """Post-append bookkeeping: rolling page reclamation (StreamingLLM)
        then the slot's page-table row. ``spec_slack``: a speculative step
        may roll the length back by up to spec_slack, so trim only pages
        below the WORST-CASE post-rollback window start."""
        if self.cfg.window_size is not None:
            # A page whose last token sits entirely below every future
            # window start — and past the sink anchors — can never be
            # attended again; return it to the pool so unbounded generation
            # holds O(sink + window) pages per sequence.
            ps = self.scfg.page_size
            sink_pages = -(-self.cfg.sink_size // ps)
            reclaim = (new_len - spec_slack - self.cfg.window_size) // ps
            if reclaim > sink_pages:
                self.sched.trim(rid, reclaim, start=sink_pages)
        pages = self.sched.page_table(rid)
        if pages and min(pages) < 0:
            # -1 holes (trimmed logicals) must not reach the jnp table:
            # point them at the newest page — the clamped kernel walk never
            # reads below-window logicals, this only keeps indices in range.
            safe = pages[-1]
            pages = [p if p >= 0 else safe for p in pages]
        self._table[slot, : len(pages)] = pages

    def _step_multi(self, slots: np.ndarray, n: int) -> None:
        """One multi-step segment: pre-append ``n`` rows per active slot
        (reserve admission guarantees the pages), run the scanned n-step
        decode as ONE dispatch, distribute the n tokens. Stream identical
        to n single ticks (same step body, same argmax)."""
        lengths0 = np.array(self._lengths)  # pre-segment lengths
        for slot in slots:
            rid = int(self._slot_rid[slot])
            new_len = 0
            for _ in range(n):
                new_len = self.sched.append_token(rid)
                assert new_len > 0, "multi-step append outran the reservation"
            self._lengths[slot] = new_len
            # trim below the window start of the segment's FIRST position:
            # step i inside the scan reads at length0 + i + 1, so pages in
            # the first step's window must survive the whole segment
            self._update_slot_table(slot, rid, new_len, spec_slack=n - 1)
        toks, self.caches = self._multi(
            self.params,
            self.caches,
            jnp.asarray(self._next_tok),
            jnp.asarray(lengths0),
            jnp.asarray(self._table),
            jnp.asarray(self._active),
            n=n,
        )
        toks = np.asarray(toks)  # [B, n]
        self.multi_segments += 1
        for slot in slots:
            rid = int(self._slot_rid[slot])
            emit = [int(t) for t in toks[slot]]
            eos = self._eos.get(rid)
            if eos is not None and eos in emit:
                emit = emit[: emit.index(eos) + 1]
            self.outputs[rid].extend(emit)
            if self._done(rid):
                self._retire(rid, slot)
            else:
                self._next_tok[slot] = emit[-1]

    def _step_speculative(self, slots: np.ndarray) -> None:
        """One n-gram speculative tick: draft from each slot's own history,
        append all spec_k fed rows, verify them in ONE multi-token decode,
        accept the matching prefix + the target's correction token, roll
        the unkept rows back. Token stream identical to the plain path
        (the multi-token kernel rows match the single-token kernel)."""
        t = self.scfg.spec_k
        toks = np.zeros((self.scfg.max_batch, t), np.int32)
        drafts: Dict[int, List[int]] = {}
        for slot in slots:
            rid = int(self._slot_rid[slot])
            d = self._ngram[rid].draft(t - 1)
            # never draft past the remaining budget: the emission below is
            # at most len(d) + 1 tokens
            rem = self._max_new[rid] - len(self.outputs[rid])
            d = d[: max(0, rem - 1)]
            drafts[rid] = d
            toks[slot, 0] = self._next_tok[slot]
            toks[slot, 1 : 1 + len(d)] = d
            new_len = 0
            for _ in range(t):
                new_len = self.sched.append_token(rid)
                assert new_len > 0, "speculative append outran the reservation"
            self._lengths[slot] = new_len
            self._update_slot_table(slot, rid, new_len, spec_slack=t - 1)
        logits, self.caches = self._spec_decode(
            self.params,
            self.caches,
            jnp.asarray(toks),
            jnp.asarray(self._lengths),
            jnp.asarray(self._table),
            jnp.asarray(self._active),
        )
        greedy = np.asarray(jnp.argmax(logits, axis=-1))  # [B, T]
        for slot in slots:
            rid = int(self._slot_rid[slot])
            d = drafts[rid]
            g = greedy[slot]
            m = 0
            while m < len(d) and d[m] == int(g[m]):
                m += 1
            emit = d[:m] + [int(g[m])]
            eos = self._eos.get(rid)
            if eos is not None and eos in emit:
                emit = emit[: emit.index(eos) + 1]
            self.spec_rounds += 1
            self.spec_accepted += m
            keep = m + 1  # fed rows whose KV stays: [cur, d_1..d_m]
            if keep < t:
                self._lengths[slot] = self.sched.rollback(rid, t - keep)
            self._ngram[rid].extend(emit)
            self.outputs[rid].extend(emit)
            if self._done(rid):
                self._retire(rid, slot)
            else:
                self._next_tok[slot] = emit[-1]

    def _relieve_page_pressure(self, slots: np.ndarray) -> np.ndarray:
        """Lazy admission's decode-time relief valve: before this tick's
        appends, make sure the pool holds every page the active slots will
        allocate — first by LRU cache eviction, then by preempting the
        YOUNGEST running request (its pages free immediately; strict-FIFO
        re-queue at the front keeps it ahead of fresh arrivals)."""
        while True:
            needed = 0
            for slot in slots:
                rid = int(self._slot_rid[slot])
                length = int(self._lengths[slot])
                if (length % self.scfg.page_size == 0
                        and length // self.scfg.page_size
                        >= len(self.sched.page_table(rid))):
                    needed += 1
            if self.sched.stats()["free_pages"] >= needed:
                return slots
            if self.prefix_cache is not None and self.prefix_cache.evict_one():
                continue
            if len(self._admit_order) <= 1:
                raise MemoryError(
                    "page pool exhausted with a single running request "
                    "(admission accounting bug)"
                )
            self._preempt(self._admit_order[-1])
            slots = np.nonzero(self._active)[0]

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Drive :meth:`step` until every queued request completes."""
        for _ in range(max_steps):
            if not self._prompts and not self._active.any() and not self._paused:
                break
            self.step()
        else:
            raise RuntimeError("serving loop did not drain")
        return dict(self._finished)

    @property
    def finished(self) -> Dict[int, List[int]]:
        """Completed requests -> generated tokens (grows as steps run)."""
        return dict(self._finished)

    def stats(self) -> dict:
        s = self.sched.stats()
        s["active_slots"] = int(self._active.sum())
        s["finished"] = len(self._finished)
        s["preemptions"] = self.preemptions
        s["paused"] = len(self._paused)
        if self._budget is not None:
            s["prefilling"] = len(self._prefilling)
        if self.prefix_cache is not None:
            s["cached_pages"] = len(self.prefix_cache)
            s["prefix_hits"] = self.prefix_cache.hits
            s["prefix_misses"] = self.prefix_cache.misses
        if self._spec_decode is not None:
            s["spec_rounds"] = self.spec_rounds
            # tokens emitted per verify round = mean accepted + 1
            s["spec_tokens_per_round"] = round(
                (self.spec_accepted + self.spec_rounds) / max(1, self.spec_rounds), 3
            )
        return s
