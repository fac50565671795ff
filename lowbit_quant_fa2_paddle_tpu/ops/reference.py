"""Reference oracles: exact fp32 attention and quantization round-trip math.

These pure-jnp implementations are the test oracle for every Pallas kernel in
the package (the role played in the reference repo by
``manual_scaled_dot_product_attention``, reference src/core.py:46-71, and by
the MSE-vs-SDPA checks embedded in its benchmarks, utils/benchmark.py:276-291).

Layout convention: all functions here take **HND** tensors ``[B, H, S, D]``.
Scales follow the same convention with the quantized axis reduced away.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

LOG2E = math.log2(math.e)  # 1.4426950408889634
#: Mask additive constant. Not -inf: exp(-inf - -inf) = NaN in online softmax.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# Exact attention oracle
# ---------------------------------------------------------------------------


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    is_causal: bool = False,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    sm_scale: Optional[float] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    logit_cap: Optional[float] = None,
    return_lse: bool = False,
):
    """Exact fp32 scaled-dot-product attention on HND ``[B, H, S, D]`` inputs.

    Supports GQA (``k``/``v`` may have fewer heads, mapped by head-group as in
    reference src/triton/attn_qk_int8_per_block.py:104-119), causal masking,
    segment-id masking (the TPU-idiomatic varlen replacement for the
    reference's cu_seqlens pointers), and optional tanh logit capping
    (reference src/triton/utils/quant_sglang_triton_attn.py ``logit_cap``).

    Returns ``o`` (same dtype as ``q``) and, when ``return_lse``, the natural-log
    logsumexp of the scaled logits per row, shape ``[B, H, Sq]`` — matching the
    reference's public LSE contract (src/core.py:123-125: "log(sum(exp(qk)))"
    with sm_scale applied).
    """
    b, h_q, s_q, d = q.shape
    _, h_kv, s_k, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if h_kv != h_q:
        assert h_q % h_kv == 0, (h_q, h_kv)
        rep = h_q // h_kv
        kf = jnp.repeat(kf, rep, axis=1)
        vf = jnp.repeat(vf, rep, axis=1)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    if logit_cap is not None and logit_cap > 0:
        logits = logit_cap * jnp.tanh(logits / logit_cap)

    mask = None
    if is_causal:
        row = jnp.arange(s_q)[:, None]
        col = jnp.arange(s_k)[None, :]
        mask = col <= row  # [Sq, Sk]
        if window_size is not None:
            # Sliding window: q attends keys in (q - W, q], W incl. self —
            # plus the StreamingLLM sink anchors [0, sink_size).
            inw = col + window_size > row
            if sink_size > 0:
                inw = jnp.logical_or(inw, col < sink_size)
            mask = jnp.logical_and(mask, inw)
        mask = mask[None, None]
    if q_segment_ids is not None:
        assert kv_segment_ids is not None
        seg = q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if mask is not None:
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p / l, vf)
    o = o.astype(q.dtype)
    if return_lse:
        lse = (m + jnp.log(l))[..., 0]  # natural log
        return o, lse
    return o


def attention_reference_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    chunk: int = 1024,
):
    """Memory-bounded exact attention: identical math to
    :func:`attention_reference`, computed per q-chunk so the logits tensor
    never exceeds ``[B, H, chunk, Sk]`` — the oracle for sequence lengths
    where the naive oracle would materialize tens of GB (e.g. 17k-token
    CogVideoX latents or 128K contexts)."""
    b, h, s_q, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if k.shape[1] != h:  # GQA
        rep = h // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    n = -(-s_q // chunk)
    pad = n * chunk - s_q
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))

    def one(carry, idx):
        qc = jax.lax.dynamic_slice_in_dim(qp, idx * chunk, chunk, axis=2)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qc.astype(jnp.float32), k.astype(jnp.float32)
        ) * sm_scale
        if is_causal:
            row = idx * chunk + jnp.arange(chunk)[:, None]
            col = jnp.arange(k.shape[2])[None, :]
            logits = jnp.where(col <= row, logits, DEFAULT_MASK_VALUE)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", p / jnp.sum(p, axis=-1, keepdims=True),
            v.astype(jnp.float32),
        )
        return carry, o

    _, chunks = jax.lax.scan(one, None, jnp.arange(n))
    o = jnp.moveaxis(chunks, 0, 2).reshape(b, h, n * chunk, d)[:, :, :s_q]
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Quantization reference math
# ---------------------------------------------------------------------------


def round_away(x: jax.Array) -> jax.Array:
    """Round half away from zero — matches the reference's ``+0.5*sign``
    convention (reference src/triton/quant_per_block.py:158-161)."""
    return jax.lax.round(x, jax.lax.RoundingMethod.AWAY_FROM_ZERO)


def quant_symmetric_ref(
    x: jax.Array,
    *,
    bits: int = 8,
    block: int = 0,
    eps: float = 1e-7,
):
    """Symmetric abs-max quantization oracle over HND ``[B, H, S, D]``.

    One scale per ``block`` consecutive seq rows (whole rows × head_dim, the
    reference's per-block granularity, quant_per_block.py:132-178); ``block=1``
    is per-token granularity (the TPU analog of the reference's
    per-warp/per-thread scales, quant_per_thread.py:22-119); ``block=0`` is
    per-tensor.

    Returns ``(codes_int8, scale)`` where codes hold values in
    ``[-(2^(bits-1)-1), 2^(bits-1)-1]`` stored as int8, and ``scale`` has shape
    ``[B, H, ceil(S/block)]`` (or ``[B, H, 1]`` when per-tensor).
    """
    b, h, s, d = x.shape
    qmax = float(2 ** (bits - 1) - 1)
    xf = x.astype(jnp.float32)
    if block == 0:
        amax = jnp.max(jnp.abs(xf), axis=(2, 3), keepdims=True)  # [B,H,1,1]
        scale = amax / qmax + eps
        codes = round_away(xf / scale)
        scale_out = scale[..., 0]
    else:
        nblk = -(-s // block)
        pad = nblk * block - s
        xp = jnp.pad(xf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        xb = xp.reshape(b, h, nblk, block, d)
        amax = jnp.max(jnp.abs(xb), axis=(3, 4), keepdims=True)
        scale = amax / qmax + eps
        codes = round_away(xb / scale).reshape(b, h, nblk * block, d)[:, :, :s]
        scale_out = scale[..., 0, 0]
    codes = jnp.clip(codes, -qmax, qmax).astype(jnp.int8)
    return codes, scale_out


def dequant_symmetric_ref(codes: jax.Array, scale: jax.Array, *, block: int = 0, seq_len: Optional[int] = None):
    """Inverse of :func:`quant_symmetric_ref`."""
    b, h, s, d = codes.shape
    c = codes.astype(jnp.float32)
    if block == 0:
        return c * scale[:, :, :, None]  # scale [B,H,1] -> [B,H,1,1]
    scale_rows = jnp.repeat(scale, block, axis=2)[:, :, :s]
    return c * scale_rows[..., None]


def quant_group_asym_ref(x: jax.Array, *, bits: int, group: int):
    """Asymmetric min/max group quantization oracle along the last dim.

    The KIVI-style convention of the reference's
    ``triton_quantize_and_pack_along_last_dim`` (new_pack.py:247-300):
    ``scale = (max-min)/(2^bits - 1)``, ``code = round((x - min)/scale)``.

    Returns ``(codes_int32, scale, mn)``; codes in ``[0, 2^bits-1]``.
    """
    *lead, d = x.shape
    assert d % group == 0, (d, group)
    xg = x.astype(jnp.float32).reshape(*lead, d // group, group)
    mn = jnp.min(xg, axis=-1, keepdims=True)
    mx = jnp.max(xg, axis=-1, keepdims=True)
    scale = (mx - mn) / (2**bits - 1)
    scale = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(round_away((xg - mn) / scale), 0, 2**bits - 1).astype(jnp.int32)
    return (
        codes.reshape(*lead, d),
        scale[..., 0],
        mn[..., 0],
    )


def dequant_group_asym_ref(codes: jax.Array, scale: jax.Array, mn: jax.Array, *, group: int):
    *lead, d = codes.shape
    cg = codes.astype(jnp.float32).reshape(*lead, d // group, group)
    out = cg * scale[..., None] + mn[..., None]
    return out.reshape(*lead, d)


# ---------------------------------------------------------------------------
# Smooth-K / smooth-V helper math (reference src/core.py:292-304, 855-869)
# ---------------------------------------------------------------------------


def smooth_k_reference(k: jax.Array):
    """Return ``(k - mean, mean)`` with the mean over the sequence axis.

    Subtracting the per-(B,H,D) K mean before quantization removes the shared
    outlier direction (SageAttention "smooth-K"); softmax output is invariant,
    only the LSE shifts by ``q·kmᵀ·sm_scale`` (reference src/core.py:344-350).
    """
    km = jnp.mean(k.astype(jnp.float32), axis=2, keepdims=True)
    return (k.astype(jnp.float32) - km).astype(k.dtype), km


def lse_smooth_k_correction(lse: jax.Array, q: jax.Array, km: jax.Array, sm_scale: float):
    """Correct an LSE computed on smoothed K back to the true LSE.

    ``lse_true = lse_smoothed + (q @ kmᵀ) * sm_scale`` in natural-log space
    (reference src/core.py:344-350).
    """
    corr = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), km.astype(jnp.float32))[..., 0]
    return lse + corr * sm_scale


def attention_quantized_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    q_bits: int = 8,
    k_bits: int = 8,
    block_q: int = 128,
    block_k: int = 64,
    smooth_k: bool = True,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
):
    """Quantize-then-attend oracle: what a *perfect* kernel consuming
    per-block quantized Q/K should produce. Used to separate kernel bugs from
    quantization error in tests (mirroring the reference's integer-valued
    input trick, utils/benchmark.py:215-226)."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if smooth_k:
        k_s, _ = smooth_k_reference(k)
    else:
        k_s = k
    q_c, q_s = quant_symmetric_ref(q, bits=q_bits, block=block_q)
    k_c, k_s_scale = quant_symmetric_ref(k_s, bits=k_bits, block=block_k)
    q_dq = dequant_symmetric_ref(q_c, q_s, block=block_q)
    k_dq = dequant_symmetric_ref(k_c, k_s_scale, block=block_k)
    return attention_reference(
        q_dq.astype(jnp.float32),
        k_dq.astype(jnp.float32),
        v,
        is_causal=is_causal,
        sm_scale=sm_scale,
    ).astype(q.dtype)
