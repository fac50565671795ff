"""Fused weight-quantized matmul (Pallas/TPU) — packed weights stay packed
in HBM and are dequantized in VMEM, inside the kernel.

TPU-native re-design of the reference's KIVI GEMV extension
(``gemv_forward_cuda`` / ``gemv_forward_cuda_outer_dim``,
src/triton/utils/quant/csrc/gemv_cuda.cu:60-565, and the Triton
``gemv.py``/``matmul.py qbvm``): 4/2/8-bit grouped weight × activation
matmul for weight-only-quantized serving layers. The host-level
``ops/pack.quantized_matmul`` materializes the dequantized weight matrix in
HBM and re-reads it (3 whole-W HBM passes); this kernel streams the PACKED
bytes once — the memory-bound regime (decode GEMV) runs at the packed
bandwidth.

Layout choices (TPU-first, not the CUDA layout):

* Weights ``[N, K]`` are packed along K with a **parts-of-K** scheme: byte
  (4-bit) or int32-word lanes hold codes strided by ``K/per_word``, so each
  extracted part is a CONTIGUOUS K-range and unpacking is shift/mask plus a
  lane concat — no in-register interleave (same reasoning as the
  halves-of-D attention pack, ops/quant.py).
* Group (``group_size`` along K) asymmetric quantization ``w = c*s + m`` is
  applied EXACTLY, split by linearity:
      x @ W^T = sum_g s_g * (x_g . c_g)  +  sum_g m_g * sigma_g,
  where ``sigma_g = sum_k x_gk`` — the mn term is a tiny ``[M,G] @ [G,N]``
  MXU matmul OUTSIDE the kernel, and the kernel applies per-group scales by
  accumulating one small dot per (part, group) tile. Zero-points therefore
  cost one extra outer matmul instead of a per-element fma (contrast the
  reference's int4 ``forward_merging`` which silently DROPS zero-points —
  SURVEY "quirks").
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops.quant import cdiv, default_interpret
from lowbit_quant_fa2_paddle_tpu.ops.reference import round_away


# ---------------------------------------------------------------------------
# Pack (parts-of-K)
# ---------------------------------------------------------------------------


def pack_weights(
    w: jax.Array, *, group_size: int = 128, bits: int = 4
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric group quantization of a dense ``[N, K]`` weight matrix,
    packed parts-of-K into int8 (4/2-bit; 8-bit stays one code per byte).

    Returns ``(packed int8 [N, K*bits/8], scale f32 [N, K/group_size],
    mn f32 [N, K/group_size])`` with ``w ≈ code * scale + mn`` and unsigned
    codes in ``[0, 2^bits)``.
    """
    assert bits in (2, 4, 8), bits
    n, k = w.shape
    assert k % group_size == 0, (k, group_size)
    fpb = 8 // bits  # codes per byte
    assert k % fpb == 0
    wf = w.astype(jnp.float32).reshape(n, k // group_size, group_size)
    mn = jnp.min(wf, axis=-1)
    mx = jnp.max(wf, axis=-1)
    scale = (mx - mn) / (2**bits - 1)
    scale = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(
        round_away((wf - mn[..., None]) / scale[..., None]), 0, 2**bits - 1
    ).astype(jnp.int32)
    codes = codes.reshape(n, k)
    if fpb == 1:
        packed = codes.astype(jnp.int8)
    else:
        kw = k // fpb  # bytes per row; part i holds codes [i*kw, (i+1)*kw)
        parts = [codes[:, i * kw : (i + 1) * kw] for i in range(fpb)]
        acc = parts[0]
        for i in range(1, fpb):
            acc = acc | (parts[i] << (i * bits))
        packed = acc.astype(jnp.int8)
    return packed, scale, mn


def unpack_weights(packed: jax.Array, *, bits: int) -> jax.Array:
    """Inverse of :func:`pack_weights` -> unsigned int32 codes ``[N, K]``."""
    if bits == 8:
        return packed.astype(jnp.int32) & 0xFF
    fpb = 8 // bits
    mask = (1 << bits) - 1
    p = packed.astype(jnp.int32) & 0xFF  # zero-extend the byte
    parts = [(p >> (i * bits)) & mask for i in range(fpb)]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Fused kernel
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class WQWeight:
    """Per-channel packed weight as a pytree node: arrays are leaves, the
    bit width is STATIC aux data (so jitted model fns specialize on it).
    Shared by the model integrations (models/llm.py, models/dit.py)."""

    def __init__(self, packed: jax.Array, scale: jax.Array, bits: int):
        self.packed = packed
        self.scale = scale
        self.bits = bits

    def tree_flatten(self):
        return (self.packed, self.scale), self.bits

    @classmethod
    def tree_unflatten(cls, bits, leaves):
        return cls(leaves[0], leaves[1], bits)


def pack_weights_per_channel(
    w: jax.Array, *, bits: int = 8
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel quantization (the standard w8/w4 serving
    config): ``w ≈ code * scale[n]``, signed codes, 4-bit nibble-packed
    halves-of-K. Returns ``(packed int8 [N, K*bits/8], scale f32 [N])``."""
    assert bits in (4, 8), bits
    n, k = w.shape
    qmax = 127.0 if bits == 8 else 7.0
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-1) / qmax + 1e-8  # [N]
    codes = jnp.clip(round_away(wf / scale[:, None]), -qmax, qmax).astype(jnp.int32)
    if bits == 8:
        return codes.astype(jnp.int8), scale
    # 4-bit codes are stored UNSIGNED (c + 7, in [0, 14]) so the matmul can
    # route through the grouped engine's zero-extend unpack (w = c*s - 7s);
    # signed nibble sign-extension measured ~3x slower there.
    half = k // 2
    lo = (codes[:, :half] + 7) & 0xF
    hi = (codes[:, half:] + 7) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8), scale


def _wq_pc_kernel(x_ref, w_ref, s_ref, o_ref, *, bits: int, x_dtype, xs_ref=None):
    """Per-channel path: codes feed the MXU with at most one unpack/cast —
    no per-element dequant chain (the scale is a rank-1 epilogue)."""
    w = w_ref[...]  # [BN, KB] int8
    if bits == 4:
        p32 = w.astype(jnp.int32)  # sign-extends
        lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
        hi = jax.lax.shift_right_arithmetic(p32, 4)
        w = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)  # [BN, K]
    if x_dtype == jnp.int8:
        d = jax.lax.dot_general(
            x_ref[...], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        d = d * xs_ref[...]  # [M, 1] per-token activation scale
    else:
        d = jax.lax.dot_general(
            x_ref[...], w.astype(x_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = (d * s_ref[0:1, :]).astype(o_ref.dtype)  # [1, BN] bcast


def wq_matmul_per_channel(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    *,
    bits: int = 8,
    activation: str = "bf16",
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x @ W^T`` with symmetric per-channel-quantized W
    (:func:`pack_weights_per_channel`). ``activation="int8"`` additionally
    quantizes x per token and runs the INT8 MXU dot (w8a8); ``"bf16"`` keeps
    x as-is (w8a16 / w4a16). ``block_n=None`` consults the durable autotune
    cache (bench/autotune.py --space gemv, keyed by bits/K/pow2-N bucket)
    and falls back to the measured default 1024."""
    if interpret is None:
        interpret = default_interpret()
    *lead, k = x.shape
    n = packed.shape[0]
    if block_n is None:
        from lowbit_quant_fa2_paddle_tpu.utils import tuning

        ent = tuning.lookup_entry(
            f"gemv_w{bits}", k, tuning.pow2_bucket(n), False
        )
        block_n = int(ent["block_kv"]) if ent else 1024
    kb = packed.shape[1]
    m_total = 1
    for s_ in lead:
        m_total *= s_
    if m_total >= 1024:
        # Prefill-sized M: the matmul is MXU-bound and the O(N*K) dequant
        # amortizes over M — materialize W once (XLA) and take the dense
        # matmul at full MXU rate. The fused streaming kernel is the
        # DECODE-shape (small-M, weight-bandwidth-bound) path; at the
        # 17776-token video shape it measured ~30% slower than dense.
        w = dequant_weights(packed, scale, bits=bits)
        wt = w.astype(jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32)
        return jnp.einsum("...k,nk->...n", x, wt).astype(x.dtype)
    if bits == 4:
        # Stored unsigned-biased (pack note); route through the grouped
        # engine with one group per part: w = c*s + (-7s). ~3x faster than
        # an in-kernel sign-extend chain (495 vs ~150 us at N11008 K4096).
        kw = k // 2
        sc = jnp.repeat(scale.astype(jnp.float32)[:, None], 2, axis=1)  # [N, 2]
        mn = jnp.broadcast_to((-7.0 * scale.astype(jnp.float32))[:, None], (n, 2))
        return wq_matmul_fused(
            x, packed, sc, mn, bits=4, group_size=kw,
            block_n=block_n, interpret=interpret,
        )
    assert bits == 8, bits  # bits=4 delegated above
    m = 1
    for s_ in lead:
        m *= s_
    xf = x.reshape(m, k)
    x_cast = jnp.bfloat16 if xf.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    xb = 1 if activation == "int8" else jnp.dtype(x_cast).itemsize
    # VMEM budget: packed tile + the cast copy of it (xb bytes/code).
    bn = min(block_n, n)
    while bn > 128 and bn * kb * (1 + xb) > 8 * 1024 * 1024:
        bn //= 2
    bm = min(m, 256)  # tile M for prefill-sized activations
    while bm > 8 and bm * k * xb > 2 * 1024 * 1024:
        bm //= 2
    args = []
    in_specs = []
    if activation == "int8":
        xs = jnp.max(jnp.abs(xf.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0 + 1e-8
        xq = jnp.clip(round_away(xf.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
        args += [xq, packed, scale.astype(jnp.float32)[None, :], xs]
        in_specs += [
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, kb), lambda mi, ni: (ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM),
        ]
        x_dtype = jnp.int8
        kernel = functools.partial(_wq_pc_kernel_int8, bits=bits)
    else:
        x_dtype = jnp.bfloat16 if xf.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
        args += [xf.astype(x_dtype), packed, scale.astype(jnp.float32)[None, :]]
        in_specs += [
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, kb), lambda mi, ni: (ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni), memory_space=pltpu.VMEM),
        ]
        kernel = functools.partial(_wq_pc_kernel, bits=bits, x_dtype=x_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(m, bm), cdiv(n, bn)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, n)


def _wq_pc_kernel_int8(x_ref, w_ref, s_ref, xs_ref, o_ref, *, bits: int):
    _wq_pc_kernel(x_ref, w_ref, s_ref, o_ref, bits=bits, x_dtype=jnp.int8, xs_ref=xs_ref)


def _wq_kernel(
    x_ref,  # [M, K] (VMEM-resident activations)
    w_ref,  # [BN, KB] packed int8 row tile (full K)
    s_ref,  # [BN, G] per-group scales (original group order, full lanes)
    o_ref,  # [M, BN]
    *,
    bits: int,
    kw: int,  # codes per part row (= K // fpb)
    group_size: int,
    x_dtype,
):
    # Single grid dim over N: the whole packed row tile is VMEM-resident, so
    # every slice below is STATIC (dynamic lane picks don't lower in
    # Mosaic), and each part needs exactly ONE big MXU dot — per-(part,
    # group) dots at M≈8 were pipeline-latency-bound (measured 530 us for
    # int4 at N=11008 K=4096 vs ~150 us this way).
    w = w_ref[...].astype(jnp.int32) & 0xFF  # [BN, KB] zero-extended bytes
    fpb = 8 // bits
    mask = (1 << bits) - 1
    acc = None
    gs_per_part = kw // group_size
    for i in range(fpb):
        part = (w >> (i * bits)) & mask if fpb > 1 else w  # [BN, KB]
        part = part.astype(jnp.float32)
        # Fold the per-(n, group) scale into the codes (one VPU mul per
        # code, [BN, 1] column broadcast over group lanes) so the whole
        # part contracts in one dot.
        scaled = []
        for g in range(gs_per_part):
            sg = s_ref[:, i * gs_per_part + g : i * gs_per_part + g + 1]  # [BN, 1] f32
            # Scale in f32, THEN cast: a bf16*bf16 product would round the
            # weight twice (~0.8% rel), swamping the int8 quant error.
            scaled.append(
                (part[:, g * group_size : (g + 1) * group_size] * sg).astype(x_dtype)
            )
        cs = jnp.concatenate(scaled, axis=1)  # [BN, kw]
        xg = x_ref[:, i * kw : (i + 1) * kw]  # part i = K range [i*kw, (i+1)*kw)
        d = jax.lax.dot_general(
            xg, cs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [M, BN]
        acc = d if acc is None else acc + d
    o_ref[...] = acc.astype(o_ref.dtype)


def wq_matmul_fused(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    mn: Optional[jax.Array] = None,
    *,
    bits: int = 4,
    group_size: int = 128,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x @ W^T`` with W stored packed (parts-of-K, :func:`pack_weights`).

    ``x`` is ``[..., K]``; returns ``[..., N]``. The packed weight bytes are
    streamed through VMEM exactly once; zero-points (``mn``) are applied via
    the outer ``sigma @ mn^T`` identity (see module docstring).
    """
    if interpret is None:
        interpret = default_interpret()
    *lead, k = x.shape
    n = packed.shape[0]
    fpb = 8 // bits
    kb = k // fpb  # packed bytes per row
    kw = k // fpb  # codes per part (== kb)
    m = 1
    for s_ in lead:
        m *= s_
    xf = x.reshape(m, k)
    assert packed.shape == (n, kb), (packed.shape, n, kb)
    g_total = k // group_size
    assert scale.shape == (n, g_total)
    if m >= 1024:
        # Prefill-sized M: dequant once (XLA) + dense MXU matmul — see the
        # per-channel routing note.
        w = dequant_weights(packed, scale, mn, bits=bits, group_size=group_size)
        wt = w.astype(jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32)
        return jnp.einsum("mk,nk->mn", xf, wt).astype(x.dtype).reshape(*lead, n)

    # Each part must cover whole groups (group_size | K/fpb). Grid has a
    # single N dimension; the whole packed row tile sits in VMEM (see the
    # kernel note). block_n shrinks to keep the tile + x under ~4 MB.
    assert kw % group_size == 0, (kw, group_size)
    x_dtype = jnp.bfloat16 if xf.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    xb = jnp.dtype(x_dtype).itemsize
    # VMEM budget (scoped limit 16 MB): packed tile (1 B) + the f32 unpack
    # and x_dtype scaled-codes intermediates (~4 + xb B per packed byte).
    bn = min(block_n, n)
    while bn > 128 and bn * kb * (5 + xb) > 8 * 1024 * 1024:
        bn //= 2
    bm = min(m, 256)  # tile M for prefill-sized activations
    while bm > 8 and bm * k * xb > 2 * 1024 * 1024:
        bm //= 2
    out = pl.pallas_call(
        functools.partial(
            _wq_kernel,
            bits=bits,
            kw=kw,
            group_size=group_size,
            x_dtype=x_dtype,
        ),
        grid=(cdiv(m, bm), cdiv(n, bn)),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, kb), lambda mi, ni: (ni, 0), memory_space=pltpu.VMEM),
            # Per-group scales, original (= part-major) group order; full
            # lane dim keeps the block legal and every kernel pick static.
            pl.BlockSpec((bn, g_total), lambda mi, ni: (ni, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xf.astype(x_dtype), packed, scale.astype(jnp.float32))

    if mn is not None:
        # Zero-point term: sum_g m_g * sigma_g, sigma = per-group sums of x.
        sigma = xf.astype(jnp.float32).reshape(m, g_total, group_size).sum(-1)
        out = (out.astype(jnp.float32) + sigma @ mn.T.astype(jnp.float32)).astype(x.dtype)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Differentiable wrapper (training through frozen quantized weights)
# ---------------------------------------------------------------------------


def dequant_weights(
    packed: jax.Array,
    scale: jax.Array,
    mn: Optional[jax.Array] = None,
    *,
    bits: int,
    group_size: Optional[int] = None,
) -> jax.Array:
    """Materialize the f32 ``[N, K]`` weight matrix from either storage
    format: grouped-asymmetric (:func:`pack_weights`; ``mn`` + ``scale [N,
    G]``) or symmetric per-channel (:func:`pack_weights_per_channel`;
    ``scale [N]``, 4-bit stored unsigned-biased). Reference
    ``dequantize_weight`` (qmodule.py:13-30)."""
    n = packed.shape[0]
    if scale.ndim == 1:  # per-channel symmetric
        if bits == 8:
            codes = packed.astype(jnp.float32)
        else:
            codes = (unpack_weights(packed, bits=4) - 7).astype(jnp.float32)
        return codes * scale.astype(jnp.float32)[:, None]
    assert group_size is not None
    codes = unpack_weights(packed, bits=bits).astype(jnp.float32)
    g_total = codes.shape[1] // group_size
    w = codes.reshape(n, g_total, group_size) * scale.astype(jnp.float32)[..., None]
    if mn is not None:
        w = w + mn.astype(jnp.float32)[..., None]
    return w.reshape(n, codes.shape[1])


def wq_matmul_trainable(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    mn: Optional[jax.Array] = None,
    *,
    bits: int = 4,
    group_size: Optional[int] = 128,
    **kw,
) -> jax.Array:
    """Differentiable ``x @ W^T`` over frozen packed weights — the
    TPU-native ``MatMul4Bit`` / ``WQLinearForTrain`` (reference
    qmodule.py:33-75): forward runs the fused packed-weight kernel (for
    small-m/decode shapes the packed bytes stream through VMEM without a
    dense-W materialization; the m>=1024 prefill route and every backward
    dequantize W once); backward returns ``dL/dx = g @ W_deq``, exactly
    the reference's backward. The quantization params are frozen
    (``stop_gradient``; no weight cotangent), matching the reference where
    only activations (LoRA-style tuning, upstream layers) receive
    gradients.

    ``scale.ndim == 1`` selects the per-channel symmetric format
    (:func:`wq_matmul_per_channel`), else grouped-asymmetric
    (:func:`wq_matmul_fused`).

    Reverse-mode only (``custom_vjp``): ``jax.jvp``/``jacfwd`` raise on
    this path — use the natively-differentiable host backend
    (``pack.quantized_matmul``) for forward-mode.
    """
    packed = jax.lax.stop_gradient(packed)
    scale = jax.lax.stop_gradient(scale)
    mn = jax.lax.stop_gradient(mn) if mn is not None else None

    @jax.custom_vjp
    def f(x):
        if scale.ndim == 1:
            assert mn is None, "per-channel symmetric format has no zero-points"
            return wq_matmul_per_channel(x, packed, scale, bits=bits, **kw)
        return wq_matmul_fused(
            x, packed, scale, mn, bits=bits, group_size=group_size, **kw
        )

    def fwd(x):
        return f(x), None

    def bwd(_, g):
        w = dequant_weights(packed, scale, mn, bits=bits, group_size=group_size)
        wt = w.astype(jnp.bfloat16 if g.dtype != jnp.float32 else jnp.float32)
        gx = jnp.einsum("...n,nk->...k", g, wt).astype(g.dtype)
        return (gx,)

    f.defvjp(fwd, bwd)
    return f(x)
