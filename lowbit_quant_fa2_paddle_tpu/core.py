"""Public API: dispatching low-bit attention entry points.

TPU re-design of the reference's ``src/core.py``. The reference dispatches on
CUDA SM arch (src/core.py:82-190); on TPU every generation has an int8 MXU
path, so dispatch is by **requested bit-width / quantization policy**, with
one Pallas kernel family underneath. Both the legacy ``sageattn*`` names and
the preferred ``lowbit_fa_*`` names are exported (reference
src/__init__.py:1-17).

Layouts follow the reference: ``tensor_layout="HND"`` is ``[B, H, S, D]``,
``"NHD"`` is ``[B, S, H, D]`` (reference src/core.py:226-238). Internally all
kernels run HND.

LSE contract: ``return_lse`` returns the natural-log row logsumexp of the
scaled logits, corrected for K smoothing — exactly the reference's contract
for ring attention (src/core.py:123-125, 344-350).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    LOG2E,
    flash_attention_fp,
    lowbit_attention,
    lowbit_attention_km,
)
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference

__all__ = [
    "lowbit_fa_attn",
    "lowbit_fa_qk_int8_pv_fp16",
    "lowbit_fa_qk_int8_pv_int8",
    "lowbit_fa_qk_int4_pv_fp16",
    "lowbit_fa_qk_int2_pv_fp16",
    "lowbit_fa_mixed_bits",
    "lowbit_fa_varlen",
    "lowbit_fa_multi_precision",
    "lowbit_fa_multi_precision_jit",
    "lowbit_fa_qk_int8_pv_fp16_triton",
    "lowbit_fa_qk_int8_pv_fp16_cuda",
    "lowbit_fa_qk_int8_pv_fp8_cuda",
    "lowbit_fa_qk_int4_pv_fp16_triton",
    "sageattn",
    "sageattn_qk_int8_pv_fp16_triton",
    "sageattn_qk_int8_pv_fp16_cuda",
    "sageattn_qk_int8_pv_fp8_cuda",
    "sageattn_qk_int4_pv_fp16_triton",
    "sageattn_varlen",
    "sageattn_multi_precision",
    "manual_scaled_dot_product_attention",
]


def _to_hnd(x: jax.Array, tensor_layout: str) -> jax.Array:
    if tensor_layout == "HND":
        return x
    if tensor_layout == "NHD":
        return jnp.swapaxes(x, 1, 2)
    raise ValueError(f"unknown tensor_layout {tensor_layout!r}")


def _from_hnd(x: jax.Array, tensor_layout: str) -> jax.Array:
    return x if tensor_layout == "HND" else jnp.swapaxes(x, 1, 2)


def _pad_head_dim(x: jax.Array, multiple: int = 64) -> jax.Array:
    """Zero-pad head_dim up to a lane-friendly multiple (reference pads to
    64/128, src/core.py:277-287). Zero columns leave QK^T and abs-max scales
    unchanged."""
    d = x.shape[-1]
    target = max(multiple, -(-d // multiple) * multiple)
    if target == d:
        return x
    cfg = [(0, 0)] * (x.ndim - 1) + [(0, target - d)]
    return jnp.pad(x, cfg)


def _gran_block(qk_quant_gran: str, which: str) -> tuple[str, int]:
    """Map the reference's granularity names onto (gran, block). The
    reference's per-warp/per-thread granularities have no TPU analog (no
    warps); both map to per-token scales, which dominate them in accuracy."""
    if qk_quant_gran in ("per_token", "per_thread", "per_warp"):
        return "per_token", 128
    if qk_quant_gran == "per_block":
        # Reference block sizes: Q blocks 128, K blocks 64 (quant_per_block.py).
        return "per_block", 128 if which == "q" else 64
    raise ValueError(f"unknown qk_quant_gran {qk_quant_gran!r}")


def _finish_lse(lse2: jax.Array, q: jax.Array, km: Optional[jax.Array], sm_scale: float):
    """base-2 kernel LSE -> natural log + smooth-K correction
    (reference src/core.py:344-350: ``lse/log2e + q @ km^T * sm_scale``)."""
    lse = lse2 / LOG2E
    if km is not None:
        if km.shape[1] != q.shape[1]:  # GQA: km is per KV head
            km = jnp.repeat(km, q.shape[1] // km.shape[1], axis=1)
        corr = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), km.astype(jnp.float32)
        )[..., 0]
        lse = lse + corr * sm_scale
    return lse


def _smooth_q_bias(qm, kp, km, sm_scale):
    """Per-key smooth-Q correction ``qm @ (K - km)^T * sm_scale``
    [B, H, 1, Sk] (GQA-aware). Exactness argument in the smooth_q note."""
    b, h = qm.shape[0], qm.shape[1]
    hk = kp.shape[1]
    g = h // hk
    kf = kp.astype(jnp.float32)
    if km is not None:
        kf = kf - km.astype(jnp.float32)
    qm_g = qm[:, :, 0, :].reshape(b, hk, g, -1)
    corr = jnp.einsum("bkgd,bksd->bkgs", qm_g, kf).reshape(b, h, -1)
    return (corr * sm_scale)[:, :, None, :]


def lowbit_fa_qk_int8_pv_fp16(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tensor_layout: str = "HND",
    quantization_backend: str = "pallas",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_token",
    pv_accum_dtype: str = "fp32",
    smooth_k: bool = True,
    smooth_v: bool = False,
    return_lse: bool = False,
    *,
    smooth_q: bool = False,
    # Causal sliding window: each q attends its previous ``window_size``
    # keys including itself (ops/attention banded grid — O(S*W) work).
    window_size: Optional[int] = None,
    # StreamingLLM attention sinks: keys [0, sink_size) stay visible.
    sink_size: int = 0,
    kernel_space: str = "auto",
    fuse_quant: Optional[bool] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: Optional[bool] = None,
    **kwargs,
):
    """INT8-QK attention with floating PV (reference
    ``sageattn_qk_int8_pv_fp16_triton``/``_cuda``, src/core.py:194-352,
    495-731).

    ``fuse_quant`` ∈ {None, True, "q", False}. On the default K-major route
    (``kernel_space="k"``) any truthy value quantizes Q in-kernel (hoisted
    per-token quant + VMEM relayout, bit-identical to external codes; K's
    external quant is O(S) and needs no transpose, so Q is the only fusion
    that pays); None defaults to fused at per-token granularity — measured
    7.02 ms fused vs 7.60 ms external from-bf16 at b4 h32 s4096 hd64.
    On the Q-major route ("q"): True quantizes Q/K per-token INSIDE the
    attention kernel, deleting both quant HBM round trips — measured
    12.4 -> 9.1 ms from bf16 inputs at b4 h32 s4096 hd64 (1.37x,
    PERFORMANCE.md); "q" is the HYBRID (Q in-kernel, K external with
    pre-transposed codes — the long-sequence winner); None picks True below
    s≈4k and "q" beyond, whenever the config is exact (per-token
    granularity, pallas backend). False forces external quant kernels.

    ``pv_accum_dtype`` maps the reference's accumulation policies onto the
    MXU: TPU matmuls accumulate fp32 natively, so {"fp16", "fp16+fp32",
    "fp32"} all select bf16 P/V operands with an fp32 accumulator, and
    "fp32+fp32" selects fp32 operands (slower, more mantissa for P). The
    reference's fp16-accumulator buffer machinery
    (qk_int_sv_f16_buffer_cuda.cu) is unnecessary on TPU by construction.
    ``quantization_backend``: "pallas" (≙ reference "triton"/"cuda") or
    "xla" (pure-XLA quantizers, cross-check path).

    ``kernel_space`` ∈ {"auto", "k", "q"}: "k" runs the K-major
    (transposed-space) kernel — full-lane PV dot + sublane softmax
    reductions, 86.6 vs 68.9 TF at b4h32s4096hd64, and the from-bf16
    drop-in beats the Q-major policy at every measured shape (8.41 vs
    8.93 ms at s4096, 31.45 vs 37.39 at s17776 incl. the V/O transposes) —
    see ops/attention._attn_body_km. "q" keeps the Q-major kernel, where
    the ``fuse_quant`` policies apply. "auto" = "k".
    """
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    d_og = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d_og)
    qp, kp = _pad_head_dim(q), _pad_head_dim(k)

    backend = "xla" if quantization_backend == "xla" else "pallas"
    km = quant_ops.k_mean(kp) if smooth_k else None
    if kernel_space == "auto":
        kernel_space = "k"
    if kernel_space == "k":
        gq, bq = _gran_block(qk_quant_gran, "q")
        gk, bk = _gran_block(qk_quant_gran, "k")
        # K quantized in NATURAL layout (K-major needs no K transpose at
        # all). Q side, fuse_quant policy: in-kernel hoisted per-token quant
        # + VMEM relayout (deletes the external Q quant kernel AND the Q^T
        # pass; bit-identical math) vs external Q^T codes straight from the
        # quant kernel's in-VMEM relayout. Hardware-verified (round 2):
        # fused-Q 7.02 ms vs external 7.60 ms from-bf16 at b4h32 s4096 hd64,
        # delta 0.00e+00 — so auto defaults to fused whenever the in-kernel
        # quant reproduces the requested granularity (per-token).
        fuse_q = fuse_quant
        if fuse_q is None:
            fuse_q = (
                backend == "pallas"
                and _gran_block(qk_quant_gran, "q")[0] == "per_token"
            )
        k_codes, k_scale = quant_ops.quant_int8(
            kp, km, gran=gk, block=bk, backend=backend, interpret=interpret
        )
        # Smooth-Q (SageAttention2-class outlier smoothing, exact): subtract
        # the per-channel Q mean before quantization and add the row-varying
        # correction qm @ (K - km)^T back as a per-key bias — softmax is
        # exact because the remaining q @ km term is row-constant. Finer Q
        # scales when Q carries a common channel component (e.g. RoPE-free
        # sink heads); the LSE correction below still uses the ORIGINAL q.
        qq, bias = qp, None
        if smooth_q:
            qm = jnp.mean(qp.astype(jnp.float32), axis=2, keepdims=True)  # [B,H,1,D]
            qq = (qp.astype(jnp.float32) - qm).astype(qp.dtype)
            bias = _smooth_q_bias(qm, kp, km, sm_scale)
        if fuse_q:
            q_in, q_scale = qq, None
        else:
            q_in, q_scale = quant_ops.quant_int8(
                qq, gran=gq, block=bq, backend=backend, layout="ds", interpret=interpret
            )
        v_mean = None
        v_in = v
        if smooth_v:
            v_mean = jnp.mean(v.astype(jnp.float32), axis=2)  # [B,Hk,D]
            v_in = (v.astype(jnp.float32) - v_mean[:, :, None, :]).astype(v.dtype)
        vT = jnp.swapaxes(_pad_head_dim(v_in), 2, 3)
        out = lowbit_attention_km(
            q_in,
            k_codes,
            vT,
            q_scale,
            k_scale,
            fused_quant_q=bool(fuse_q),
            bias=bias,
            v_mean=v_mean,
            is_causal=is_causal,
            window_size=window_size,
            sink_size=sink_size,
            sm_scale=sm_scale,
            pv_dtype=jnp.float32 if pv_accum_dtype == "fp32+fp32" else jnp.bfloat16,
            out_dtype=v.dtype,
            return_lse=return_lse,
            interpret=interpret,
        )
        if return_lse:
            oT, lse2 = out
            lse = _finish_lse(lse2, qp, km, sm_scale)
            return _from_hnd(jnp.swapaxes(oT, 2, 3)[..., :d_og], tensor_layout), lse
        return _from_hnd(jnp.swapaxes(out, 2, 3)[..., :d_og], tensor_layout)
    if fuse_quant is None:
        # Auto policy (per-token + pallas only — the configs in-kernel quant
        # reproduces bit-for-bit). Full fusion ("both") re-quantizes the K
        # tile on every (q_block, kv_block) visit — O(S^2) rework, ~15% on
        # the kernel — but deletes both external HBM round trips, winning at
        # short seq (s4096: fused 9.1 ms vs external ~9.6). The HYBRID mode
        # ("q") quantizes only Q in-kernel (a ~1% [BQ, D] pass, since the
        # K-side stays external O(S) with pre-transposed codes) and wins
        # beyond the crossover (s17776: hybrid vs external 38.7 vs fused
        # 43.4 — see PERFORMANCE.md).
        if backend == "pallas" and _gran_block(qk_quant_gran, "q")[0] == "per_token":
            fuse_quant = True if k.shape[2] <= 4096 else "q"
        else:
            fuse_quant = False
    if fuse_quant is True:
        assert backend != "xla", "fuse_quant quantizes in-kernel"
        q_codes, q_scale, k_codes, k_scale = qp, None, kp, None
    elif fuse_quant == "q":
        assert _gran_block(qk_quant_gran, "q")[0] == "per_token", (
            "hybrid fuse_quant='q' quantizes Q in-kernel at per-token granularity"
        )
        gk, bk = _gran_block(qk_quant_gran, "k")
        q_codes, q_scale = qp, None
        k_codes, k_scale = quant_ops.quant_int8(
            kp, km, gran=gk, block=bk, backend=backend, layout="ds", interpret=interpret
        )
    else:
        gq, bq = _gran_block(qk_quant_gran, "q")
        gk, bk = _gran_block(qk_quant_gran, "k")
        q_codes, q_scale = quant_ops.quant_int8(
            qp, gran=gq, block=bq, backend=backend, interpret=interpret
        )
        # K codes come out pre-transposed [B,Hk,D,Sk] — the layout the QK dot
        # consumes — deleting a whole-tensor XLA int8 transpose pass.
        k_codes, k_scale = quant_ops.quant_int8(
            kp, km, gran=gk, block=bk, backend=backend, layout="ds", interpret=interpret
        )
    v_in = v
    v_mean = None
    if smooth_v:
        # Smooth-V with float V (reference sageattn_qk_int8_pv_fp16_cuda
        # smooth_v): subtract the per-channel mean, add it back in the
        # kernel epilogue (softmax rows sum to 1).
        v_mean = jnp.mean(v.astype(jnp.float32), axis=2)  # [B,Hk,D]
        v_in = (v.astype(jnp.float32) - v_mean[:, :, None, :]).astype(v.dtype)

    pv_dtype = jnp.float32 if pv_accum_dtype == "fp32+fp32" else jnp.bfloat16
    out = lowbit_attention(
        q_codes,
        k_codes,
        v_in,
        q_scale,
        k_scale,
        fused_quant=fuse_quant is True,
        fused_quant_q=fuse_quant == "q",
        k_mean=km if fuse_quant is True else None,
        k_transposed=fuse_quant is not True,
        v_mean=v_mean,
        is_causal=is_causal,
        window_size=window_size,
        sink_size=sink_size,
        sm_scale=sm_scale,
        pv_dtype=pv_dtype,
        block_q=block_q,
        block_kv=block_kv,
        out_dtype=v.dtype,
        return_lse=return_lse,
        interpret=interpret,
    )
    if return_lse:
        o, lse2 = out
        lse = _finish_lse(lse2, qp, km, sm_scale)
        return _from_hnd(o[..., :d_og], tensor_layout), lse
    return _from_hnd(out[..., :d_og], tensor_layout)


def lowbit_fa_qk_int8_pv_int8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_token",
    smooth_k: bool = True,
    smooth_v: bool = True,
    return_lse: bool = False,
    *,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    kernel_space: str = "auto",
    fuse_quant: Optional[bool] = None,
    pv_int8: bool = False,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: Optional[bool] = None,
    **kwargs,
):
    """INT8-QK attention with per-channel INT8 V — the TPU analog of the
    reference's FP8-PV path (``sageattn_qk_int8_pv_fp8_cuda``,
    src/core.py:735-941): V is quantized per channel, its scale (and, with
    ``smooth_v``, its extracted mean) fused back in the kernel epilogue. On
    TPU the win is halved V HBM traffic rather than an FP8 MMA."""
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    d_og = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d_og)
    qp, kp = _pad_head_dim(q), _pad_head_dim(k)

    km = quant_ops.k_mean(kp) if smooth_k else None
    gq, bq = _gran_block(qk_quant_gran, "q")
    gk, bk = _gran_block(qk_quant_gran, "k")
    k_major = kernel_space in ("auto", "k")
    # Hardware-verified round 2: fused-Q beats external on-chip (see the
    # int8 wrapper) — auto defaults to fused at per-token granularity.
    fuse_q = k_major and (gq == "per_token" if fuse_quant is None else bool(fuse_quant))
    if fuse_q:
        q_codes, q_scale = qp, None
    else:
        q_codes, q_scale = quant_ops.quant_int8(
            qp, gran=gq, block=bq, layout="ds" if k_major else "ns", interpret=interpret
        )
    k_codes, k_scale = quant_ops.quant_int8(kp, km, gran=gk, block=bk, interpret=interpret)
    v_codes, v_scale, v_mean = quant_ops.quant_v_int8_per_channel(
        _pad_head_dim(v), smooth_v=smooth_v
    )

    if k_major:
        oT = lowbit_attention_km(
            q_codes,
            k_codes,
            jnp.swapaxes(v_codes, 2, 3),
            q_scale,
            k_scale,
            fused_quant_q=fuse_q,
            pv_int8=pv_int8,
            v_scale=v_scale,
            v_mean=v_mean,
            is_causal=is_causal,
            window_size=window_size,
            sink_size=sink_size,
            sm_scale=sm_scale,
            out_dtype=v.dtype,
            return_lse=return_lse,
            interpret=interpret,
        )
        if return_lse:
            oT, lse2 = oT
            lse = _finish_lse(lse2, qp, km, sm_scale)
            return _from_hnd(jnp.swapaxes(oT, 2, 3)[..., :d_og], tensor_layout), lse
        return _from_hnd(jnp.swapaxes(oT, 2, 3)[..., :d_og], tensor_layout)

    out = lowbit_attention(
        q_codes,
        k_codes,
        v_codes,
        q_scale,
        k_scale,
        v_scale=v_scale,
        v_mean=v_mean,
        pv_int8=pv_int8,
        is_causal=is_causal,
        window_size=window_size,
        sink_size=sink_size,
        sm_scale=sm_scale,
        block_q=block_q,
        block_kv=block_kv,
        out_dtype=v.dtype,
        return_lse=return_lse,
        interpret=interpret,
    )
    if return_lse:
        o, lse2 = out
        lse = _finish_lse(lse2, qp, km, sm_scale)
        return _from_hnd(o[..., :d_og], tensor_layout), lse
    return _from_hnd(out[..., :d_og], tensor_layout)


def lowbit_fa_qk_int4_pv_fp16(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_token",
    smooth_k: bool = True,
    return_lse: bool = False,
    *,
    smooth_q: bool = False,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    kernel_space: str = "auto",
    fuse_quant: Optional[bool] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    interpret: Optional[bool] = None,
    **kwargs,
):
    """INT8-Q × INT4-K attention (reference
    ``sageattn_qk_int4_pv_fp16_triton``, src/core.py:945-1036: Q 8-bit,
    K 4-bit). K codes are nibble-packed (halved HBM traffic) and unpacked on
    the VPU inside the kernel before the int8 MXU dot. Unlike the reference's
    ``forward_merging``, which drops zero-points as an approximation
    (SURVEY §"quirks"), our symmetric per-token K scales need no zero point
    at all.

    Accuracy note (bench/int4_gran_probe.py, PERFORMANCE.md r3): per-token
    scales are within ~0.005 cos of the 4-bit scalar-quantizer floor on
    unstructured keys; for keys with channel outliers use the KIVI
    per-channel grouped path (``ops.fused_kv.fused_packed_kv_attention``)
    — measured 0.992 where per-token collapses to 0.86."""
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    d_og = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d_og)
    qp, kp = _pad_head_dim(q), _pad_head_dim(k)

    km = quant_ops.k_mean(kp) if smooth_k else None
    if kernel_space in ("auto", "k"):
        # K-major route: K packed in NATURAL layout (the nibble unpack runs
        # along lanes in-kernel), V transposed. Q side per the fuse_quant
        # policy (see the int8 wrapper): in-kernel hoisted quant+relayout by
        # default, external Q^T codes with fuse_quant=False.
        gq, bq = _gran_block(qk_quant_gran, "q")
        gk, bk = _gran_block(qk_quant_gran, "k")
        # Auto = fused-Q at per-token granularity (hardware-verified, round 2).
        fuse_q = gq == "per_token" if fuse_quant is None else bool(fuse_quant)
        qq, bias = qp, None
        if smooth_q:
            # Smooth-Q matters most here: int4-K pairs with int8-Q, and a
            # common Q channel component eats the 8-bit budget (see the int8
            # wrapper's smooth_q note for the exactness argument).
            qm = jnp.mean(qp.astype(jnp.float32), axis=2, keepdims=True)
            qq = (qp.astype(jnp.float32) - qm).astype(qp.dtype)
            bias = _smooth_q_bias(qm, kp, km, sm_scale)
        if fuse_q:
            q_in, q_scale = qq, None
        else:
            q_in, q_scale = quant_ops.quant_int8(
                qq, gran=gq, block=bq, layout="ds", interpret=interpret
            )
        k_packed, k_scale = quant_ops.quant_int4(kp, km, gran=gk, block=bk, interpret=interpret)
        out = lowbit_attention_km(
            q_in,
            k_packed,
            jnp.swapaxes(_pad_head_dim(v), 2, 3),
            q_scale,
            k_scale,
            fused_quant_q=bool(fuse_q),
            bias=bias,
            k_packed_int4=True,
            is_causal=is_causal,
            window_size=window_size,
            sink_size=sink_size,
            sm_scale=sm_scale,
            out_dtype=v.dtype,
            return_lse=return_lse,
            interpret=interpret,
        )
        if return_lse:
            oT, lse2 = out
            lse = _finish_lse(lse2, qp, km, sm_scale)
            return _from_hnd(jnp.swapaxes(oT, 2, 3)[..., :d_og], tensor_layout), lse
        return _from_hnd(jnp.swapaxes(out, 2, 3)[..., :d_og], tensor_layout)
    if fuse_quant is None:
        # Same auto rule as the int8 path (see its docstring note): full
        # fusion below the crossover, hybrid Q-only fusion beyond it.
        if _gran_block(qk_quant_gran, "q")[0] == "per_token":
            fuse_quant = True if k.shape[2] <= 4096 else "q"
        else:
            fuse_quant = False
    if fuse_quant is True:
        # In-kernel Q-int8 / K-int4 quantization: bit-identical values to
        # the packed external path (packing only changes storage), minus
        # the quant kernels' HBM round trips.
        out = lowbit_attention(
            qp,
            kp,
            v,
            None,
            None,
            fused_quant=True,
            fused_k_bits=4,
            k_mean=km,
            is_causal=is_causal,
            window_size=window_size,
            sink_size=sink_size,
            sm_scale=sm_scale,
            block_q=block_q,
            block_kv=block_kv,
            out_dtype=v.dtype,
            return_lse=return_lse,
            interpret=interpret,
        )
        if return_lse:
            o, lse2 = out
            return _from_hnd(o[..., :d_og], tensor_layout), _finish_lse(lse2, qp, km, sm_scale)
        return _from_hnd(out[..., :d_og], tensor_layout)
    gk, bk = _gran_block(qk_quant_gran, "k")
    k_packed, k_scale = quant_ops.quant_int4(kp, km, gran=gk, block=bk, interpret=interpret)
    if fuse_quant == "q":
        q_codes, q_scale = qp, None  # Q quantized in-kernel (hybrid)
    else:
        gq, bq = _gran_block(qk_quant_gran, "q")
        q_codes, q_scale = quant_ops.quant_int8(qp, gran=gq, block=bq, interpret=interpret)

    out = lowbit_attention(
        q_codes,
        k_packed,
        v,
        q_scale,
        k_scale,
        fused_quant_q=fuse_quant == "q",
        is_causal=is_causal,
        window_size=window_size,
        sink_size=sink_size,
        sm_scale=sm_scale,
        k_packed_int4=True,
        block_q=block_q,
        block_kv=block_kv,
        out_dtype=v.dtype,
        return_lse=return_lse,
        interpret=interpret,
    )
    if return_lse:
        o, lse2 = out
        lse = _finish_lse(lse2, qp, km, sm_scale)
        return _from_hnd(o[..., :d_og], tensor_layout), lse
    return _from_hnd(out[..., :d_og], tensor_layout)


def lowbit_fa_qk_int2_pv_fp16(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_token",
    smooth_k: bool = True,
    return_lse: bool = False,
    *,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    fuse_quant: Optional[bool] = None,
    interpret: Optional[bool] = None,
    **kwargs,
):
    """INT8-Q x INT2-K attention (codes in {-1,0,1}, four per byte —
    quarter the K HBM traffic). The reference benchmarks an INT2 variant
    (utils/benchmark.py:407-511); accuracy is materially lower than INT4 —
    intended for the aggressive end of the per-token bit-allocation sweep."""
    q = _to_hnd(q, tensor_layout)
    k = _to_hnd(k, tensor_layout)
    v = _to_hnd(v, tensor_layout)
    d_og = q.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d_og)
    qp, kp = _pad_head_dim(q), _pad_head_dim(k)
    km = quant_ops.k_mean(kp) if smooth_k else None
    gq, bq = _gran_block(qk_quant_gran, "q")
    gk, bk = _gran_block(qk_quant_gran, "k")
    # Auto = fused-Q at per-token granularity (hardware-verified, round 2).
    fuse_q = gq == "per_token" if fuse_quant is None else bool(fuse_quant)
    if fuse_q:
        q_in, q_scale = qp, None
    else:
        q_in, q_scale = quant_ops.quant_int8(
            qp, gran=gq, block=bq, layout="ds", interpret=interpret
        )
    k_packed, k_scale = quant_ops.quant_int2(kp, km, gran=gk, block=bk, interpret=interpret)
    out = lowbit_attention_km(
        q_in, k_packed, jnp.swapaxes(_pad_head_dim(v), 2, 3), q_scale, k_scale,
        fused_quant_q=fuse_q,
        is_causal=is_causal, window_size=window_size, sink_size=sink_size,
        sm_scale=sm_scale, k_pack_bits=2,
        out_dtype=v.dtype, return_lse=return_lse, interpret=interpret,
    )
    if return_lse:
        oT, lse2 = out
        lse = _finish_lse(lse2, qp, km, sm_scale)
        return _from_hnd(jnp.swapaxes(oT, 2, 3)[..., :d_og], tensor_layout), lse
    return _from_hnd(jnp.swapaxes(out, 2, 3)[..., :d_og], tensor_layout)


def quantize_with_bitmap(
    k: jax.Array, bitmap: jax.Array, *, block: int = 128
) -> jax.Array:
    """Per-token-block mixed-precision quantization error injection
    (reference ``quantize_with_bitmap``, utils/benchmark.py:689-720): token
    blocks flagged 1 in ``bitmap`` keep int8 fidelity; blocks flagged 0 are
    rounded through int4 first. Output is a float tensor carrying the mixed
    quantization error, consumed by the standard int8 pipeline — matching
    the reference's bitmap bench semantics."""
    b, h, s, d = k.shape
    nblk = -(-s // block)
    pad = nblk * block - s
    kf = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = kf.reshape(b, h, nblk, block, d)
    amax = jnp.max(jnp.abs(kb), axis=(3, 4), keepdims=True)
    scale4 = amax / 7.0 + 1e-7
    k4 = jnp.clip(jnp.round(kb / scale4), -7, 7) * scale4
    keep8 = bitmap.reshape(1, 1, nblk, 1, 1).astype(bool)
    mixed = jnp.where(keep8, kb, k4).reshape(b, h, nblk * block, d)[:, :, :s]
    return mixed.astype(k.dtype)


def lowbit_fa_mixed_bits(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bitmap: jax.Array,
    *,
    tensor_layout: str = "HND",
    block: int = 128,
    **kw,
):
    """Per-token-block dynamic bit allocation: int8 kernel over K whose
    blocks were mixed int8/int4 per importance ``bitmap`` (the reference's
    mixed-precision bitmap bench + ``mp_`` kernel placeholder)."""
    kh = _to_hnd(k, tensor_layout)
    k_mixed = _from_hnd(quantize_with_bitmap(kh, bitmap, block=block), tensor_layout)
    return lowbit_fa_qk_int8_pv_fp16(q, k_mixed, v, tensor_layout=tensor_layout, **kw)


def lowbit_fa_varlen(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_token",
    smooth_k: bool = True,
    *,
    # Sliding window in PACKED positions — equal to within-sequence
    # distances for contiguously packed sequences (the varlen layout).
    # sink_size anchors PACKED keys [0, sink): combined with the segment
    # mask that means only the FIRST packed sequence has sink anchors —
    # use sinks with single-sequence varlen batches.
    window_size: Optional[int] = None,
    sink_size: int = 0,
    kernel_space: str = "auto",
    fuse_quant: Optional[bool] = None,
    interpret: Optional[bool] = None,
    **kwargs,
):
    """Ragged-batch INT8 attention (reference ``sageattn_varlen``,
    src/core.py:356-491).

    Inputs are packed ``[total_tokens, H, D]`` with ``cu_seqlens_*`` prefix
    sums (the reference's flash-attn varlen convention). TPU-idiomatically
    this becomes **segment-id masking** inside the same dense kernel: tokens
    of different sequences never attend to each other, and global causal
    masking restricted to equal segments is exactly per-sequence causal
    masking (sequences are contiguous in the packed layout).

    Note: the reference computes the smooth-K mean over the *whole packed
    batch* (src/core.py:447-449) rather than per sequence; we match that —
    softmax output is invariant to any shared K offset.
    """
    t, h, d_og = q.shape
    # [T, H, D] -> HND with batch 1.
    qh = jnp.swapaxes(q, 0, 1)[None]
    kh = jnp.swapaxes(k, 0, 1)[None]
    vh = jnp.swapaxes(v, 0, 1)[None]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d_og)

    pos_q = jnp.arange(q.shape[0])
    pos_k = jnp.arange(k.shape[0])
    # segment id = which sequence a token belongs to (rightmost cu bound).
    q_seg = jnp.searchsorted(cu_seqlens_q[1:], pos_q, side="right")[None]
    kv_seg = jnp.searchsorted(cu_seqlens_k[1:], pos_k, side="right")[None]

    qp, kp = _pad_head_dim(qh), _pad_head_dim(kh)
    km = quant_ops.k_mean(kp) if smooth_k else None
    if kernel_space in ("auto", "k"):
        gq, bq = _gran_block(qk_quant_gran, "q")
        gk, bk = _gran_block(qk_quant_gran, "k")
        # Hardware-verified (round 2): fused-Q + segment ids is bit-identical
        # to the external-quant path and 1.12x faster (T=8192 causal varlen).
        fuse_q = gq == "per_token" if fuse_quant is None else bool(fuse_quant)
        if fuse_q:
            q_in, q_scale = qp, None
        else:
            q_in, q_scale = quant_ops.quant_int8(
                qp, gran=gq, block=bq, layout="ds", interpret=interpret
            )
        k_codes, k_scale = quant_ops.quant_int8(
            kp, km, gran=gk, block=bk, interpret=interpret
        )
        oT = lowbit_attention_km(
            q_in,
            k_codes,
            jnp.swapaxes(_pad_head_dim(vh), 2, 3),
            q_scale,
            k_scale,
            fused_quant_q=bool(fuse_q),
            q_segment_ids=q_seg,
            kv_segment_ids=kv_seg,
            is_causal=is_causal,
            window_size=window_size,
            sink_size=sink_size,
            sm_scale=sm_scale,
            out_dtype=v.dtype,
            interpret=interpret,
        )
        return jnp.swapaxes(jnp.swapaxes(oT, 2, 3)[..., :d_og][0], 0, 1)
    if fuse_quant is None:
        # Same auto rule as the dense int8 path: full fusion below the
        # crossover (packed total tokens), hybrid Q-only fusion beyond.
        if _gran_block(qk_quant_gran, "q")[0] == "per_token":
            fuse_quant = True if k.shape[0] <= 4096 else "q"
        else:
            fuse_quant = False
    if fuse_quant is True:
        q_codes, q_scale, k_codes, k_scale = qp, None, kp, None
    elif fuse_quant == "q":
        gk, bk = _gran_block(qk_quant_gran, "k")
        q_codes, q_scale = qp, None
        k_codes, k_scale = quant_ops.quant_int8(
            kp, km, gran=gk, block=bk, layout="ds", interpret=interpret
        )
    else:
        gq, bq = _gran_block(qk_quant_gran, "q")
        gk, bk = _gran_block(qk_quant_gran, "k")
        q_codes, q_scale = quant_ops.quant_int8(qp, gran=gq, block=bq, interpret=interpret)
        k_codes, k_scale = quant_ops.quant_int8(
            kp, km, gran=gk, block=bk, layout="ds", interpret=interpret
        )

    o = lowbit_attention(
        q_codes,
        k_codes,
        vh,
        q_scale,
        k_scale,
        fused_quant=fuse_quant is True,
        fused_quant_q=fuse_quant == "q",
        k_transposed=fuse_quant is not True,
        k_mean=km if fuse_quant is True else None,
        q_segment_ids=q_seg,
        kv_segment_ids=kv_seg,
        is_causal=is_causal,
        window_size=window_size,
        sink_size=sink_size,
        sm_scale=sm_scale,
        out_dtype=v.dtype,
        interpret=interpret,
    )
    return jnp.swapaxes(o[..., :d_og][0], 0, 1)  # back to [T, H, D]


# ---------------------------------------------------------------------------
# Multi-precision selection (reference src/core.py:1039-1096)
# ---------------------------------------------------------------------------


def compute_scale(x: jax.Array) -> jax.Array:
    """Average per-tensor abs-max scale used by the selector
    (reference ``compute_scale``, src/core.py:1039-1047)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0


def select_quantization(q: jax.Array, k: jax.Array, *, fp16_threshold=0.2, int8_threshold=0.05) -> str:
    """Pick a precision from average scale — reference thresholds
    (src/core.py:1050-1063: >0.2 fp16, >0.05 int8, else int4). Host-side
    (concretizes device values); see ``lowbit_fa_multi_precision``."""
    avg = float((compute_scale(q) + compute_scale(k)) / 2.0)
    if avg > fp16_threshold:
        return "fp16"
    if avg > int8_threshold:
        return "int8"
    return "int4"


def lowbit_fa_multi_precision_jit(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    fp16_threshold: float = 0.2,
    int8_threshold: float = 0.05,
    interpret: Optional[bool] = None,
):
    """Jit-compatible multi-precision dispatch: all three branches are
    compiled and ``lax.switch`` selects at runtime from the traced scale
    statistic (the reference's selector is host-side Python only,
    src/core.py:1050-1096 — this removes that jit restriction at the cost
    of compiling three kernels)."""
    avg = (compute_scale(q) + compute_scale(k)) / 2.0
    idx = jnp.where(avg > fp16_threshold, 0, jnp.where(avg > int8_threshold, 1, 2))

    def fp_branch(q, k, v):
        qh, kh, vh = (_to_hnd(x, tensor_layout) for x in (q, k, v))
        o = flash_attention_fp(
            qh, kh, vh, is_causal=is_causal, window_size=window_size,
            sink_size=sink_size, sm_scale=sm_scale, interpret=interpret,
        )
        return _from_hnd(o.astype(v.dtype), tensor_layout)

    return jax.lax.switch(
        idx,
        [
            fp_branch,
            lambda q, k, v: lowbit_fa_qk_int8_pv_fp16(
                q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
                window_size=window_size, sink_size=sink_size,
                sm_scale=sm_scale, interpret=interpret,
            ).astype(v.dtype),
            lambda q, k, v: lowbit_fa_qk_int4_pv_fp16(
                q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
                window_size=window_size, sink_size=sink_size,
                sm_scale=sm_scale, interpret=interpret,
            ).astype(v.dtype),
        ],
        q, k, v,
    )


def lowbit_fa_multi_precision(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    window_size: Optional[int] = None,
    sink_size: int = 0,
    interpret: Optional[bool] = None,
):
    """Dynamic bit allocation at the call level (reference
    ``sageattn_multi_precision``, src/core.py:1066-1096): inspect tensor
    scales, dispatch fp16 / int8 / int4. Host-side dispatch — not jittable
    (the reference's is Python-level too); inside jit use
    :func:`lowbit_fa_multi_precision_jit`. Window/sink semantics are
    honored by EVERY branch (a silently full-causal fp branch would be a
    wrong answer, not a fallback)."""
    choice = select_quantization(q, k)
    if choice == "fp16":
        # Unlike the reference's fp16 branch (which ignores tensor_layout —
        # SURVEY §"quirks"), honor the layout.
        qh, kh, vh = (_to_hnd(x, tensor_layout) for x in (q, k, v))
        o = flash_attention_fp(
            qh, kh, vh, is_causal=is_causal, window_size=window_size,
            sink_size=sink_size, sm_scale=sm_scale, interpret=interpret,
        )
        return _from_hnd(o.astype(v.dtype), tensor_layout)
    if choice == "int8":
        return lowbit_fa_qk_int8_pv_fp16(
            q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
            window_size=window_size, sink_size=sink_size,
            sm_scale=sm_scale, interpret=interpret,
        )
    return lowbit_fa_qk_int4_pv_fp16(
        q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
        window_size=window_size, sink_size=sink_size,
        sm_scale=sm_scale, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Auto dispatch + legacy aliases
# ---------------------------------------------------------------------------


def lowbit_fa_attn(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    return_lse: bool = False,
    *,
    bits: str = "int8",
    **kwargs,
):
    """Auto-dispatching entry point (reference ``sageattn``,
    src/core.py:82-190). The reference branches on SM arch; every TPU
    generation runs the same Pallas family, so dispatch is by ``bits``:
    'int8' | 'int8_v8' (int8 V, the fp8-PV analog) | 'int4' | 'fp' | 'auto'.
    """
    if bits == "auto":
        assert not return_lse, "bits='auto' does not export LSE (pick a bits mode)"
        return lowbit_fa_multi_precision(
            q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
            sm_scale=sm_scale,
            window_size=kwargs.pop("window_size", None),
            sink_size=kwargs.pop("sink_size", 0),
            interpret=kwargs.pop("interpret", None),
        )
    if bits == "int8":
        return lowbit_fa_qk_int8_pv_fp16(
            q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
            sm_scale=sm_scale, return_lse=return_lse, **kwargs
        )
    if bits == "int8_v8":
        return lowbit_fa_qk_int8_pv_int8(
            q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
            sm_scale=sm_scale, return_lse=return_lse, **kwargs
        )
    if bits == "int4":
        return lowbit_fa_qk_int4_pv_fp16(
            q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
            sm_scale=sm_scale, return_lse=return_lse, **kwargs
        )
    if bits == "int2":
        return lowbit_fa_qk_int2_pv_fp16(
            q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
            sm_scale=sm_scale, return_lse=return_lse, **kwargs
        )
    if bits == "fp":
        qh, kh, vh = (_to_hnd(x, tensor_layout) for x in (q, k, v))
        o = flash_attention_fp(qh, kh, vh, is_causal=is_causal, sm_scale=sm_scale, **kwargs)
        return _from_hnd(o.astype(v.dtype), tensor_layout)
    raise ValueError(f"unknown bits {bits!r}")


def manual_scaled_dot_product_attention(q, k, v, *, is_causal=False, sm_scale=None, tensor_layout="HND"):
    """Naive exact attention (reference src/core.py:46-71)."""
    qh, kh, vh = (_to_hnd(x, tensor_layout) for x in (q, k, v))
    o = attention_reference(qh, kh, vh, is_causal=is_causal, sm_scale=sm_scale)
    return _from_hnd(o, tensor_layout)


# Legacy reference names (reference src/__init__.py:1-17). The *_triton /
# *_cuda suffixes are kept verbatim for drop-in parity; on TPU they select
# quantization granularities of equivalent accuracy class (per_block ≙ the
# triton kernels, per_token ≙ the per-warp/per-thread CUDA kernels).
sageattn = lowbit_fa_attn


def sageattn_qk_int8_pv_fp16_triton(q, k, v, **kw):
    kw.setdefault("qk_quant_gran", "per_block")
    return lowbit_fa_qk_int8_pv_fp16(q, k, v, **kw)


def sageattn_qk_int8_pv_fp16_cuda(q, k, v, **kw):
    kw.setdefault("qk_quant_gran", "per_token")
    return lowbit_fa_qk_int8_pv_fp16(q, k, v, **kw)


def sageattn_qk_int8_pv_fp8_cuda(q, k, v, **kw):
    return lowbit_fa_qk_int8_pv_int8(q, k, v, **kw)


def sageattn_qk_int4_pv_fp16_triton(q, k, v, **kw):
    return lowbit_fa_qk_int4_pv_fp16(q, k, v, **kw)


sageattn_varlen = lowbit_fa_varlen
sageattn_multi_precision = lowbit_fa_multi_precision

# The reference also exports the suffixed forms under its preferred
# lowbit_fa_* naming (reference src/__init__.py:9-16); keep those
# spellings resolvable too.
lowbit_fa_qk_int8_pv_fp16_triton = sageattn_qk_int8_pv_fp16_triton
lowbit_fa_qk_int8_pv_fp16_cuda = sageattn_qk_int8_pv_fp16_cuda
lowbit_fa_qk_int8_pv_fp8_cuda = sageattn_qk_int8_pv_fp8_cuda
lowbit_fa_qk_int4_pv_fp16_triton = sageattn_qk_int4_pv_fp16_triton
