"""Functional GQA transformer LM exercising the full inference stack:
causal INT8 prefill -> quantized KV cache -> split-stream decode kernel.

The reference hosts its LLM decode experiments in inferenceKit + the sglang
decode kernel (SURVEY §2.6, quant_sglang_triton_attn.py); here the model is
in-repo and drives ops/decode.py and the quantized cache directly. Weight
quantization (WQLinear, 4-bit) is available for the MLP/projection weights
(reference qmodule.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab: int = 256
    dim: int = 256
    depth: int = 2
    num_heads: int = 8
    num_kv_heads: int = 2
    max_seq: int = 512
    rope_theta: float = 10000.0
    dtype: Any = jnp.float32
    # KV-cache precision: 16 (bf16 baseline), 8 (int8, the latency point) or
    # 4 (nibble-packed int4, quarter-size cache); see ops/decode.py +
    # DECODE_TPU.json. `k_bits`/`v_bits` override per side — e.g. the
    # KIVI-style k4v8 mix (4-bit K, 8-bit V), the measured 128K decode
    # latency AND 3/8-memory winner.
    kv_bits: int = 8
    k_bits: Optional[int] = None
    v_bits: Optional[int] = None
    # Weight precision: None = dense bf16/f32; 8/4 = per-channel symmetric
    # packed weights run through the fused Pallas matmul (ops/gemv.py;
    # int8 measured 2.13x over dense at decode shapes, int4 1.56x at
    # quarter memory). Apply with :func:`quantize_llm_params`.
    w_bits: Optional[int] = None
    # Sliding-window attention (Mistral-class): each position attends its
    # previous `window_size` tokens including itself, at prefill (banded
    # block-skip kernel grid) and decode (rolling KV window — the decode
    # kernel streams O(window) bytes per token). None = full causal.
    window_size: Optional[int] = None
    # StreamingLLM attention sinks: with a window, the first `sink_size`
    # tokens stay visible to every position (softmax anchors).
    sink_size: int = 0

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def eff_k_bits(self) -> int:
        return self.kv_bits if self.k_bits is None else self.k_bits

    @property
    def eff_v_bits(self) -> int:
        return self.kv_bits if self.v_bits is None else self.v_bits


def tiny_llm_config(**kw) -> LLMConfig:
    return LLMConfig(**kw)


def init_llm_params(key: jax.Array, cfg: LLMConfig) -> Params:
    keys = jax.random.split(key, cfg.depth + 2)
    d, dt = cfg.dim, cfg.dtype
    hd = cfg.head_dim
    kv_d = cfg.num_kv_heads * hd

    def dense(k, i, o):
        return jax.random.normal(k, (i, o), jnp.float32).astype(dt) / math.sqrt(i)

    def block(k):
        ks = jax.random.split(k, 7)
        return {
            "wq": dense(ks[0], d, d),
            "wk": dense(ks[1], d, kv_d),
            "wv": dense(ks[2], d, kv_d),
            "wo": dense(ks[3], d, d),
            "w1": dense(ks[4], d, 4 * d),
            "w2": dense(ks[5], 4 * d, d),
            "ln1": jnp.ones((d,), dt),
            "ln2": jnp.ones((d,), dt),
        }

    return {
        "embed": jax.random.normal(keys[0], (cfg.vocab, d), jnp.float32).astype(dt) * 0.02,
        "blocks": [block(keys[1 + i]) for i in range(cfg.depth)],
        "ln_f": jnp.ones((cfg.dim,), dt),
    }


_WQ_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2")


from lowbit_quant_fa2_paddle_tpu.ops.gemv import WQWeight  # noqa: E402


def quantize_llm_params(params: Params, *, bits: int = 8) -> Params:
    """Replace every block's dense matrices with per-channel packed weights
    (reference WQLinear role, qmodule.py:6-159; fused kernel ops/gemv.py).

    Dense mats here are ``[in, out]`` used as ``x @ w``; gemv wants
    ``W [N=out, K=in]`` with ``y = x @ W^T`` — i.e. ``w.T``."""
    from lowbit_quant_fa2_paddle_tpu.ops import gemv

    out = dict(params)
    blocks = []
    for blk in params["blocks"]:
        nb = dict(blk)
        for key in _WQ_KEYS:
            packed, scale = gemv.pack_weights_per_channel(blk[key].T, bits=bits)
            nb[key] = WQWeight(packed, scale, bits)
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def _mm(x: jax.Array, w, interpret=None) -> jax.Array:
    """Dense or fused weight-quantized matmul, by weight type."""
    if isinstance(w, WQWeight):
        from lowbit_quant_fa2_paddle_tpu.ops import gemv

        return gemv.wq_matmul_per_channel(
            x, w.packed, w.scale, bits=w.bits, interpret=interpret
        )
    return x @ w


def _rms_norm(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32**2, axis=-1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x: [B, H, S, D]; positions: [B, S]."""
    d = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, d // 2, dtype=jnp.float32) / (d // 2))
    ang = positions.astype(jnp.float32)[:, None, :, None] * freqs  # [B,1,S,D/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _attn_prefill(q, k, v, attn_impl: str, interpret, window=None, sink=0):
    if attn_impl == "int8":
        return lowbit_fa_qk_int8_pv_fp16(
            q, k, v, is_causal=True, window_size=window, sink_size=sink,
            interpret=interpret,
        )
    return attention_reference(
        q, k, v, is_causal=True, window_size=window, sink_size=sink
    )


def _attn_prefill_km(q, k, v, interpret, window=None, sink=0):
    """Transposed-space prefill attention: Q quantized in-kernel from its
    natural (RoPE'd) layout, K codes quantized in natural layout (needed
    natural for the cache anyway), O^T returned for the caller to contract
    straight into wo's dimension numbers — no O transpose pass."""
    from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops
    from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention_km

    km_mean = quant_ops.k_mean(k)
    kc, ksc = quant_ops.quant_int8(k, km_mean, gran="per_token", interpret=interpret)
    return lowbit_attention_km(
        q,
        kc,
        jnp.swapaxes(v, 2, 3),
        k_scale=ksc,
        fused_quant_q=True,
        is_causal=True,
        window_size=window,
        sink_size=sink,
        out_dtype=v.dtype,
        interpret=interpret,
    )  # [B, H, hd, S]


def llm_prefill(
    params: Params,
    tokens: jax.Array,  # [B, S]
    cfg: LLMConfig,
    *,
    attn_impl: str = "int8",
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, list]:
    """Run the prompt through the model; returns (logits [B,S,vocab],
    per-layer quantized KV caches)."""
    b, s = tokens.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][tokens]
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    caches = []
    for blk in params["blocks"]:
        xa = _rms_norm(x, blk["ln1"])
        q = _mm(xa, blk["wq"], interpret).reshape(b, s, h, hd).swapaxes(1, 2)
        k = _mm(xa, blk["wk"], interpret).reshape(b, s, hk, hd).swapaxes(1, 2)
        v = _mm(xa, blk["wv"], interpret).reshape(b, s, hk, hd).swapaxes(1, 2)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)
        if attn_impl == "int8_t" and isinstance(blk["wo"], jax.Array) and hd % 64 == 0:
            oT = _attn_prefill_km(q, k, v, interpret, window=cfg.window_size,
                                  sink=cfg.sink_size)
            x = x + jnp.einsum(
                "bhds,hde->bse", oT.astype(x.dtype), blk["wo"].reshape(h, hd, -1)
            )
        else:
            impl = "int8" if attn_impl == "int8_t" else attn_impl
            o = _attn_prefill(q, k, v, impl, interpret, window=cfg.window_size,
                              sink=cfg.sink_size)
            x = x + _mm(o.swapaxes(1, 2).reshape(b, s, -1).astype(x.dtype), blk["wo"], interpret)
        xm = _rms_norm(x, blk["ln2"])
        x = x + _mm(jax.nn.silu(_mm(xm, blk["w1"], interpret)), blk["w2"], interpret)

        # Build the layer's quantized cache from the prefill K/V.
        cache = dec.init_kv_cache(
            b, hk, cfg.max_seq, hd, k_bits=cfg.eff_k_bits, v_bits=cfg.eff_v_bits
        )
        kq, ks = jax.vmap(
            functools.partial(dec.quantize_token, bits=cfg.eff_k_bits),
            in_axes=2, out_axes=2,
        )(k)
        vq, vs = jax.vmap(
            functools.partial(dec.quantize_token, bits=cfg.eff_v_bits),
            in_axes=2, out_axes=2,
        )(v)
        cache["k"] = jax.lax.dynamic_update_slice(cache["k"], kq, (0, 0, 0, 0))
        cache["v"] = jax.lax.dynamic_update_slice(cache["v"], vq, (0, 0, 0, 0))
        cache["k_scale"] = jax.lax.dynamic_update_slice(cache["k_scale"], ks, (0, 0, 0))
        cache["v_scale"] = jax.lax.dynamic_update_slice(cache["v_scale"], vs, (0, 0, 0))
        cache["length"] = jnp.full((b,), s, jnp.int32)
        caches.append(cache)

    logits = _rms_norm(x, params["ln_f"]) @ params["embed"].T
    return logits, caches


def merge_lse(o1: jax.Array, l1: jax.Array, o2: jax.Array, l2: jax.Array):
    """Merge two partial attentions over disjoint key sets via their base-2
    LSEs — the same contract ring attention uses across chips
    (parallel/ring.py) and the serving engine uses for prefix reuse."""
    m = jnp.maximum(l1, l2)
    w1 = jnp.exp2(l1 - m)
    w2 = jnp.exp2(l2 - m)
    den = w1 + w2
    o = (
        o1.astype(jnp.float32) * (w1 / den)[..., None]
        + o2.astype(jnp.float32) * (w2 / den)[..., None]
    )
    return o.astype(o1.dtype)


def _dequant_cache_rows(codes: jax.Array, scale: jax.Array, bits: int,
                        dtype) -> jax.Array:
    """Per-token cache codes [.., S, Dc] -> values [.., S, D] in `dtype`."""
    if bits == 16:
        return codes.astype(dtype)
    if bits == 4:
        vals = dec._unpack4_cols(codes)  # halves-of-D nibble scheme
    else:
        vals = codes.astype(jnp.float32)
    return (vals * scale[..., None]).astype(dtype)


def llm_prefill_chunked(
    params: Params,
    tokens: jax.Array,  # [B, S]
    cfg: LLMConfig,
    *,
    chunk: int = 4096,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, list]:
    """Prompt prefill in fixed-size chunks at BOUNDED activation memory:
    each chunk runs causal self-attention within the chunk plus
    cross-attention over the already-written quantized cache, merged
    through the kernels' base-2 LSE contract — so a 128K prompt prefills
    with O(chunk) activations instead of O(S) (a batch-4 128K full prefill
    exceeds single-chip HBM at dim 4096). N-chunk generalization of the
    serving engine's prefix-reuse prefill (serving._chunked_prefill_forward,
    which splits once at the cached-prefix boundary).

    Cross-attention consumes the cache's own per-token codes (int8/int4 K
    straight into the quantized kernel; V dequantized per chunk). The
    attention-path quantization differs slightly from the one-shot prefill
    (which smooths K over the whole sequence), so downstream activations —
    and therefore the appended cache rows — drift by quantization-level
    amounts: cache-value cos > 0.999 (int8/bf16 K; 0.99 int4) and
    last-token logits cos > 0.999 vs :func:`llm_prefill`
    (tests/test_llm.py). Returns (last-token logits ``[B, vocab]``,
    caches)."""
    from lowbit_quant_fa2_paddle_tpu.ops.attention import (
        flash_attention_fp,
        lowbit_attention,
    )

    assert cfg.window_size is None, "chunked prefill requires full causal"
    b, s = tokens.shape
    hk, hd = cfg.num_kv_heads, cfg.head_dim
    kb, vb = cfg.eff_k_bits, cfg.eff_v_bits
    caches = [
        dec.init_kv_cache(b, hk, cfg.max_seq, hd, k_bits=kb, v_bits=vb)
        for _ in params["blocks"]
    ]
    # One jitted dispatch per chunk (recompiles per static prefix offset —
    # the cross-attention slice grows — but the whole chunk body, matmuls
    # included, runs as one device program with the caches donated).
    step = jax.jit(
        functools.partial(_prefill_chunk, cfg=cfg, interpret=interpret),
        static_argnames=("c0",),
        donate_argnums=(2,),
    )
    x_tail = None
    for c0 in range(0, s, chunk):
        sc = min(chunk, s - c0)
        x_tail, caches = step(params, tokens[:, c0 : c0 + sc], caches, c0=c0)
    logits = _rms_norm(x_tail[:, -1], params["ln_f"]) @ params["embed"].T
    return logits, caches


def _prefill_chunk(
    params: Params,
    toks_c: jax.Array,  # [B, sc]
    caches: list,
    *,
    c0: int,
    cfg: LLMConfig,
    interpret: Optional[bool],
) -> Tuple[jax.Array, list]:
    """One chunk of :func:`llm_prefill_chunked` (jitted with static c0)."""
    from lowbit_quant_fa2_paddle_tpu.ops.attention import (
        flash_attention_fp,
        lowbit_attention,
    )

    b, sc = toks_c.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    kb, vb = cfg.eff_k_bits, cfg.eff_v_bits
    x = params["embed"][toks_c]
    pos = jnp.broadcast_to(c0 + jnp.arange(sc), (b, sc))
    new_caches = list(caches)
    for li, blk in enumerate(params["blocks"]):
        xa = _rms_norm(x, blk["ln1"])
        q = _mm(xa, blk["wq"], interpret).reshape(b, sc, h, hd).swapaxes(1, 2)
        k = _mm(xa, blk["wk"], interpret).reshape(b, sc, hk, hd).swapaxes(1, 2)
        v = _mm(xa, blk["wv"], interpret).reshape(b, sc, hk, hd).swapaxes(1, 2)
        q = _rope(q, pos, cfg.rope_theta)
        k = _rope(k, pos, cfg.rope_theta)
        o2, l2 = lowbit_attention(
            q, k, v.astype(jnp.bfloat16), fused_quant=True,
            is_causal=True, return_lse=True, interpret=interpret,
        )
        if c0 > 0:
            cache = caches[li]
            v_pre = _dequant_cache_rows(
                cache["v"][:, :, :c0], cache["v_scale"][:, :, :c0],
                vb, jnp.bfloat16,
            )
            if kb == 16:
                o1, l1 = flash_attention_fp(
                    q, cache["k"][:, :, :c0], v_pre,
                    is_causal=False, return_lse=True, interpret=interpret,
                )
            elif kb == 4:
                o1, l1 = lowbit_attention(
                    q, cache["k"][:, :, :c0], v_pre,
                    k_scale=cache["k_scale"][:, :, :c0],
                    k_pack_bits=4, fused_quant_q=True,
                    is_causal=False, return_lse=True, interpret=interpret,
                )
            else:
                o1, l1 = lowbit_attention(
                    q, cache["k"][:, :, :c0], v_pre,
                    k_scale=cache["k_scale"][:, :, :c0],
                    fused_quant_q=True,
                    is_causal=False, return_lse=True, interpret=interpret,
                )
            o = merge_lse(o1, l1, o2, l2)
        else:
            o = o2
        x = x + _mm(o.swapaxes(1, 2).reshape(b, sc, -1).astype(x.dtype),
                    blk["wo"], interpret)
        xm = _rms_norm(x, blk["ln2"])
        x = x + _mm(jax.nn.silu(_mm(xm, blk["w1"], interpret)), blk["w2"],
                    interpret)

        kq, ks = jax.vmap(
            functools.partial(dec.quantize_token, bits=kb),
            in_axes=2, out_axes=2,
        )(k)
        vq, vs = jax.vmap(
            functools.partial(dec.quantize_token, bits=vb),
            in_axes=2, out_axes=2,
        )(v)
        cache = caches[li]
        new_caches[li] = {
            "k": jax.lax.dynamic_update_slice(cache["k"], kq, (0, 0, c0, 0)),
            "v": jax.lax.dynamic_update_slice(cache["v"], vq, (0, 0, c0, 0)),
            "k_scale": jax.lax.dynamic_update_slice(
                cache["k_scale"], ks, (0, 0, c0)),
            "v_scale": jax.lax.dynamic_update_slice(
                cache["v_scale"], vs, (0, 0, c0)),
            "length": jnp.full((b,), c0 + sc, jnp.int32),
        }
    return x, new_caches


def llm_decode_step(
    params: Params,
    token: jax.Array,  # [B]
    caches: list,
    cfg: LLMConfig,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, list]:
    """One autoregressive step through the quantized-cache decode kernel."""
    b = token.shape[0]
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][token][:, None, :]  # [B,1,D]
    pos = caches[0]["length"][:, None]  # [B,1]
    new_caches = []
    for blk, cache in zip(params["blocks"], caches):
        xa = _rms_norm(x, blk["ln1"])
        q = _mm(xa, blk["wq"], interpret).reshape(b, 1, h, hd).swapaxes(1, 2)
        k = _mm(xa, blk["wk"], interpret).reshape(b, 1, hk, hd).swapaxes(1, 2)
        v = _mm(xa, blk["wv"], interpret).reshape(b, 1, hk, hd).swapaxes(1, 2)
        q = _rope(q, pos, cfg.rope_theta)[:, :, 0]  # [B,H,D]
        k = _rope(k, pos, cfg.rope_theta)[:, :, 0]
        v = v[:, :, 0]
        cache = dec.append_kv(cache, k, v)
        o = dec.decode_attention(
            q,
            cache["k"],
            cache["v"],
            cache["k_scale"],
            cache["length"],
            v_scale=cache["v_scale"],
            k_bits=cfg.eff_k_bits,
            v_bits=cfg.eff_v_bits,
            window_size=cfg.window_size,
            sink_size=cfg.sink_size,
            interpret=interpret,
        )  # [B,H,D]
        x = x + _mm(o.reshape(b, 1, -1).astype(x.dtype), blk["wo"], interpret)
        xm = _rms_norm(x, blk["ln2"])
        x = x + _mm(jax.nn.silu(_mm(xm, blk["w1"], interpret)), blk["w2"], interpret)
        new_caches.append(cache)
    logits = _rms_norm(x[:, 0], params["ln_f"]) @ params["embed"].T
    return logits, new_caches


def decode_tokens(
    params: Params,
    token: jax.Array,  # [B] — the token being fed at the current position
    caches: list,
    n: int,
    cfg: LLMConfig,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, list]:
    """Greedy-decode ``n`` tokens as ONE on-device ``lax.scan`` over
    :func:`llm_decode_step` — a single dispatch per generation segment, so
    the host->device round-trip cost amortizes across all ``n`` tokens
    instead of bounding per-token latency (the round-3 "launch-overhead-
    bound" failure mode of the per-step host loop). Returns
    ``(tokens [B, n], caches)``; token ``i`` is the greedy successor of the
    position at which the input ``token`` was fed plus ``i`` steps.

    Bit-identical to looping :func:`llm_decode_step` on the host (same
    computation, same argmax); the caches ride the scan carry so XLA updates
    them in place."""

    def step(carry, _):
        tok, cs = carry
        logits, cs = llm_decode_step(params, tok, cs, cfg, interpret=interpret)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cs), nxt

    (_, caches), toks = jax.lax.scan(
        step, (token.astype(jnp.int32), caches), None, length=n
    )
    return jnp.swapaxes(toks, 0, 1), caches


def generate(
    params: Params,
    prompt: jax.Array,  # [B, S]
    n_new: int,
    cfg: LLMConfig,
    *,
    attn_impl: str = "int8",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Greedy generation: int8 prefill + ONE scanned decode dispatch
    (:func:`decode_tokens`; caches donated so the KV buffers update in
    place)."""
    logits, caches = llm_prefill(params, prompt, cfg, attn_impl=attn_impl, interpret=interpret)
    token = jnp.argmax(logits[:, -1], axis=-1)
    if n_new == 1:
        return token[:, None]
    dec_n = jax.jit(
        functools.partial(decode_tokens, n=n_new - 1, cfg=cfg, interpret=interpret),
        donate_argnums=(2,),
    )
    toks, _ = dec_n(params, token, caches)
    return jnp.concatenate([token[:, None], toks], axis=1)


def llm_verify_step(
    params: Params,
    tokens: jax.Array,  # [B, T] — last accepted token followed by drafts
    caches: list,
    cfg: LLMConfig,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, list]:
    """Speculative-verify step: feed T tokens at once through the
    quantized-cache MULTI-TOKEN decode kernel (ops/decode.py q_tokens — the
    T queries ride the kernel's sublane row dim, so verification streams
    the cache once at single-token cost) and return the logits of every
    fed token's successor, ``[B, T, vocab]``.

    Appends all T tokens' quantized K/V to the caches (lengths += T);
    on partial acceptance the caller rolls lengths back with
    :func:`rollback_caches` — the over-appended rows are simply
    overwritten by the next append (every kernel masks ``pos < length``).
    Beyond the reference (no speculative decoding anywhere)."""
    b, t = tokens.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][tokens]  # [B,T,D]
    pos = caches[0]["length"][:, None] + jnp.arange(t)[None, :]  # [B,T]
    new_caches = []
    for blk, cache in zip(params["blocks"], caches):
        xa = _rms_norm(x, blk["ln1"])
        q = _mm(xa, blk["wq"], interpret).reshape(b, t, h, hd).swapaxes(1, 2)
        k = _mm(xa, blk["wk"], interpret).reshape(b, t, hk, hd).swapaxes(1, 2)
        v = _mm(xa, blk["wv"], interpret).reshape(b, t, hk, hd).swapaxes(1, 2)
        q = _rope(q, pos, cfg.rope_theta)  # [B,H,T,hd]
        k = _rope(k, pos, cfg.rope_theta)  # [B,Hk,T,hd]
        cache = dec.append_kv_multi(cache, k, v)
        o = dec.decode_attention(
            q.swapaxes(1, 2),  # [B,T,H,hd]
            cache["k"],
            cache["v"],
            cache["k_scale"],
            cache["length"],
            v_scale=cache["v_scale"],
            k_bits=cfg.eff_k_bits,
            v_bits=cfg.eff_v_bits,
            window_size=cfg.window_size,
            sink_size=cfg.sink_size,
            interpret=interpret,
        )  # [B,T,H,hd]
        x = x + _mm(o.reshape(b, t, -1).astype(x.dtype), blk["wo"], interpret)
        xm = _rms_norm(x, blk["ln2"])
        x = x + _mm(jax.nn.silu(_mm(xm, blk["w1"], interpret)), blk["w2"], interpret)
        new_caches.append(cache)
    logits = _rms_norm(x, params["ln_f"]) @ params["embed"].T  # [B,T,vocab]
    return logits, new_caches


def rollback_caches(caches: list, lengths: jax.Array) -> list:
    """Set every layer cache's length (speculative-decode rejection): rows
    past the new length are dead — every consumer masks ``pos < length`` —
    and the next append overwrites them in place."""
    return [{**c, "length": lengths} for c in caches]


def speculative_generate(
    params: Params,
    prompt: jax.Array,  # [1, S]
    n_new: int,
    cfg: LLMConfig,
    *,
    draft_params: Params,
    draft_cfg: LLMConfig,
    spec_k: int = 4,
    attn_impl: str = "int8",
    interpret: Optional[bool] = None,
    return_stats: bool = False,
):
    """Greedy speculative decoding: a cheap draft model proposes ``spec_k``
    tokens per round; the target model scores ALL of them in ONE multi-token
    verify step (one cache stream instead of spec_k), accepts the matching
    prefix, and takes its own token at the first divergence — so the output
    is EXACTLY the target model's greedy generation, in fewer cache passes.

    The draft may be any model sharing the vocabulary — including the same
    weights at lower precision (self-speculation: e.g. ``quantize_llm_params
    (params, bits=4)`` + an int4 KV cache). Beyond the reference."""
    assert prompt.shape[0] == 1, "speculative_generate is single-sequence"
    assert draft_cfg.vocab == cfg.vocab
    logits, caches = llm_prefill(
        params, prompt, cfg, attn_impl=attn_impl, interpret=interpret
    )
    dlogits, dcaches = llm_prefill(
        draft_params, prompt, draft_cfg, attn_impl=attn_impl, interpret=interpret
    )
    del dlogits  # the target picks every emitted token, starting now
    cur = jnp.argmax(logits[:, -1], axis=-1)  # [1]
    dstep = jax.jit(
        functools.partial(llm_decode_step, cfg=draft_cfg, interpret=interpret)
    )
    out = [int(cur[0])]
    rounds = accepted_total = 0
    while len(out) < n_new:
        # Cache-capacity guard: a verify round appends k fed rows to the
        # target cache and the draft loop appends k to the draft cache —
        # writing past max_seq would CLAMP dynamic_update_slice onto
        # already-accepted rows and silently corrupt the generation.
        len0_host = int(jax.device_get(caches[0]["length"])[0])
        dlen_host = int(jax.device_get(dcaches[0]["length"])[0])
        k = min(
            spec_k,
            cfg.max_seq - len0_host,
            draft_cfg.max_seq - dlen_host,
        )
        if k < 1:
            raise ValueError(
                f"speculative_generate: cache capacity exhausted "
                f"(target {len0_host}/{cfg.max_seq}, draft "
                f"{dlen_host}/{draft_cfg.max_seq}); size max_seq >= "
                f"prompt + n_new + spec_k"
            )
        # Draft k successors of `cur` (greedy) with the draft model.
        dt = cur
        dtoks = []
        for _ in range(k):
            dl, dcaches = dstep(draft_params, dt, dcaches)
            dt = jnp.argmax(dl, axis=-1)
            dtoks.append(int(dt[0]))
        # One multi-token verify: feed [cur, d1..d_{k-1}]; row t's logits
        # score the successor of fed token t.
        fed = jnp.asarray([[int(cur[0])] + dtoks[:-1]], jnp.int32)  # [1,K]
        len0 = caches[0]["length"]
        vlogits, caches = llm_verify_step(
            params, fed, caches, cfg, interpret=interpret
        )
        greedy = [int(g) for g in jnp.argmax(vlogits[0], axis=-1)]
        m = 0
        while m < k and dtoks[m] == greedy[m]:
            m += 1
        rounds += 1
        accepted_total += m
        if m == k:
            # Every draft matched; d_k itself was never fed, so it becomes
            # the next round's `cur`. All K fed rows stay in the caches.
            out.extend(dtoks)
            cur = jnp.asarray([dtoks[-1]], jnp.int32)
        else:
            # Keep fed rows [cur, d1..d_m]; the target's own token at the
            # divergence is emitted and fed next round.
            out.extend(dtoks[:m] + [greedy[m]])
            keep = len0 + m + 1
            caches = rollback_caches(caches, keep)
            dcaches = rollback_caches(dcaches, keep)
            cur = jnp.asarray([greedy[m]], jnp.int32)
    tokens = jnp.asarray([out[:n_new]], jnp.int32)
    if return_stats:
        return tokens, {
            "rounds": rounds,
            "mean_accepted": accepted_total / max(rounds, 1),
            "spec_k": spec_k,
        }
    return tokens
