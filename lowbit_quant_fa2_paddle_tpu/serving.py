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
until ``max_new_tokens`` -> pages/slot released.

Distributed serving (context-sharded caches, head-sharded TP decode) lives
in parallel/serving.py; this engine is the single-host control loop around
the same kernels.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu import host
from lowbit_quant_fa2_paddle_tpu.models import llm as L
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """Engine shape knobs (all static under jit)."""

    page_size: int = 64  # tokens per KV page == decode block_kv
    num_pages: int = 64  # shared page pool size
    max_batch: int = 4  # decode slots
    kv_bits: int = 8  # 8 (int8) or 4 (nibble-packed) KV pages
    # Static page-table width (max pages any one sequence may hold);
    # defaults to the whole pool.
    max_pages_per_seq: Optional[int] = None

    @property
    def table_width(self) -> int:
        return self.num_pages if self.max_pages_per_seq is None else self.max_pages_per_seq


def _empty_paged_caches(cfg: L.LLMConfig, scfg: ServingConfig) -> List[dict]:
    hk, hd = cfg.num_kv_heads, cfg.head_dim
    dk = hd if scfg.kv_bits == 8 else hd // 2
    shape_c = (hk, scfg.num_pages, scfg.page_size, dk)
    shape_s = (hk, scfg.num_pages, scfg.page_size)
    return [
        {
            "k": jnp.zeros(shape_c, jnp.int8),
            "v": jnp.zeros(shape_c, jnp.int8),
            "k_scale": jnp.ones(shape_s, jnp.float32),
            "v_scale": jnp.ones(shape_s, jnp.float32),
        }
        for _ in range(cfg.depth)
    ]


def _prefill_forward(
    params: Params,
    tokens: jax.Array,  # [1, S]
    cfg: L.LLMConfig,
    kv_bits: int,
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
        o = L._attn_prefill(q, k, v, "int8", interpret)
        x = x + L._mm(o.swapaxes(1, 2).reshape(b, s, -1).astype(x.dtype), blk["wo"], interpret)
        xm = L._rms_norm(x, blk["ln2"])
        x = x + L._mm(jax.nn.silu(L._mm(xm, blk["w1"], interpret)), blk["w2"], interpret)

        qtok = functools.partial(dec.quantize_token, bits=kv_bits)
        kq, ks = jax.vmap(qtok, in_axes=2, out_axes=2)(k)  # [1,Hk,S,dk], [1,Hk,S]
        vq, vs = jax.vmap(qtok, in_axes=2, out_axes=2)(v)
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
    kv_bits: int,
    interpret: Optional[bool],
) -> Tuple[jax.Array, List[dict]]:
    """One batched decode step: write each active slot's new-token quantized
    K/V into its page, run the paged decode kernel, return logits."""
    b = tokens.shape[0]
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    n_pages = caches[0]["k"].shape[1]
    x = params["embed"][tokens][:, None, :]
    pos = lengths[:, None] - 1  # the new token's position
    kv_lengths = jnp.where(active, lengths, 0)
    page_idx = jnp.clip(pos[:, 0] // page_size, 0, page_table.shape[1] - 1)
    # inactive slots scatter to an out-of-range page id -> dropped
    pid = jnp.where(active, page_table[jnp.arange(b), page_idx], n_pages)
    off = jnp.clip(pos[:, 0], 0, None) % page_size

    new_caches = []
    for blk, cache in zip(params["blocks"], caches):
        xa = L._rms_norm(x, blk["ln1"])
        q = L._mm(xa, blk["wq"], interpret).reshape(b, 1, h, hd).swapaxes(1, 2)
        k = L._mm(xa, blk["wk"], interpret).reshape(b, 1, hk, hd).swapaxes(1, 2)
        v = L._mm(xa, blk["wv"], interpret).reshape(b, 1, hk, hd).swapaxes(1, 2)
        q = L._rope(q, pos, cfg.rope_theta)[:, :, 0]  # [B,H,D]
        k = L._rope(k, pos, cfg.rope_theta)[:, :, 0]
        v = v[:, :, 0]
        kq, ks = dec.quantize_token(k, bits=kv_bits)  # [B,Hk,dk], [B,Hk]
        vq, vs = dec.quantize_token(v, bits=kv_bits)
        cache = {
            "k": cache["k"].at[:, pid, off].set(kq.swapaxes(0, 1), mode="drop"),
            "v": cache["v"].at[:, pid, off].set(vq.swapaxes(0, 1), mode="drop"),
            "k_scale": cache["k_scale"].at[:, pid, off].set(ks.T, mode="drop"),
            "v_scale": cache["v_scale"].at[:, pid, off].set(vs.T, mode="drop"),
        }
        o = dec.decode_attention(
            q,
            cache["k"],
            cache["v"],
            cache["k_scale"],
            kv_lengths,
            v_scale=cache["v_scale"],
            page_table=page_table,
            kv_bits=kv_bits,
            block_kv=page_size,
            interpret=interpret,
        )  # [B,H,D]
        x = x + L._mm(o.reshape(b, 1, -1).astype(x.dtype), blk["wo"], interpret)
        xm = L._rms_norm(x, blk["ln2"])
        x = x + L._mm(jax.nn.silu(L._mm(xm, blk["w1"], interpret)), blk["w2"], interpret)
        new_caches.append(cache)

    logits = L._rms_norm(x[:, 0], params["ln_f"]) @ params["embed"].T
    return logits, new_caches


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
        self.sched = host.Scheduler(scfg.num_pages, scfg.page_size, scfg.max_batch)
        self.caches = _empty_paged_caches(cfg, scfg)
        b, w = scfg.max_batch, scfg.table_width
        self._table = np.zeros((b, w), np.int32)
        self._lengths = np.zeros((b,), np.int32)
        self._active = np.zeros((b,), bool)
        self._slot_rid = np.full((b,), -1, np.int32)
        self._next_tok = np.zeros((b,), np.int32)
        self._prompts: Dict[int, np.ndarray] = {}
        self._max_new: Dict[int, int] = {}
        self.outputs: Dict[int, List[int]] = {}
        self._finished: Dict[int, List[int]] = {}
        self._decode = jax.jit(
            functools.partial(
                _decode_step,
                cfg=cfg,
                page_size=scfg.page_size,
                kv_bits=scfg.kv_bits,
                interpret=interpret,
            ),
            donate_argnums=(1,),
        )

    # -- request intake ----------------------------------------------------

    def add_request(self, prompt_tokens: Sequence[int], max_new_tokens: int) -> int:
        prompt = np.asarray(prompt_tokens, np.int32)
        assert prompt.ndim == 1 and prompt.size > 0
        need_w = -(-(prompt.size + max_new_tokens - 1) // self.scfg.page_size)
        if need_w > self.scfg.table_width:
            raise MemoryError("request exceeds the static page-table width")
        rid = self.sched.add(int(prompt.size), int(max_new_tokens))
        self._prompts[rid] = prompt
        self._max_new[rid] = int(max_new_tokens)
        self.outputs[rid] = []
        return rid

    # -- lifecycle ---------------------------------------------------------

    def _prefill(self, rid: int) -> None:
        prompt = self._prompts.pop(rid)
        logits, per_layer = _prefill_forward(
            self.params, jnp.asarray(prompt)[None], self.cfg, self.scfg.kv_bits, self.interpret
        )
        pages = self.sched.page_table(rid)
        p = self.scfg.page_size
        for li, (kq, ks, vq, vs) in enumerate(per_layer):
            c = self.caches[li]
            for j, pg in enumerate(pages):
                lo, hi = j * p, min((j + 1) * p, prompt.size)
                if lo >= hi:
                    break
                n = hi - lo
                c = {
                    "k": c["k"].at[:, pg, :n].set(kq[:, lo:hi]),
                    "v": c["v"].at[:, pg, :n].set(vq[:, lo:hi]),
                    "k_scale": c["k_scale"].at[:, pg, :n].set(ks[:, lo:hi]),
                    "v_scale": c["v_scale"].at[:, pg, :n].set(vs[:, lo:hi]),
                }
            self.caches[li] = c
        slot = self.sched.info(rid)["slot"]
        tok = int(np.asarray(jnp.argmax(logits)))
        self.outputs[rid].append(tok)
        if len(self.outputs[rid]) >= self._max_new[rid]:
            self._retire(rid, slot)
            return
        self._slot_rid[slot] = rid
        self._active[slot] = True
        self._next_tok[slot] = tok
        self._lengths[slot] = prompt.size
        row = np.zeros((self.scfg.table_width,), np.int32)
        row[: len(pages)] = pages
        self._table[slot] = row

    def _retire(self, rid: int, slot: int) -> None:
        self.sched.release(rid)
        self._finished[rid] = self.outputs[rid]
        if self._slot_rid[slot] == rid:
            self._slot_rid[slot] = -1
            self._active[slot] = False
            self._lengths[slot] = 0

    def step(self) -> Dict[int, List[int]]:
        """One engine tick: admit+prefill, then one batched decode step.
        Returns requests that finished during this tick."""
        done_before = set(self._finished)
        st = self.sched.step()
        for rid in st["admitted"]:
            self._prefill(rid)

        slots = np.nonzero(self._active)[0]
        if slots.size:
            for slot in slots:
                rid = int(self._slot_rid[slot])
                new_len = self.sched.append_token(rid)
                self._lengths[slot] = new_len
                pages = self.sched.page_table(rid)
                self._table[slot, : len(pages)] = pages
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
                if len(self.outputs[rid]) >= self._max_new[rid]:
                    self._retire(rid, slot)
                else:
                    self._next_tok[slot] = tok
        return {r: t for r, t in self._finished.items() if r not in done_before}

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Drive :meth:`step` until every queued request completes."""
        for _ in range(max_steps):
            if not self._prompts and not self._active.any():
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
        return s
