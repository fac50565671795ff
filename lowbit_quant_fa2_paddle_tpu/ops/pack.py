"""Group-wise asymmetric pack/min-max quantization (KIVI-style) and the
quantized-matmul helpers built on it.

TPU re-design of the reference's ``src/triton/utils/quant/new_pack.py``
(``triton_quantize_and_pack_along_last_dim`` 247-300, ``pack_tensor`` 198-219,
``unpack_tensor`` 222-244, q/k/v-cache helpers 9-195) and the KIVI GEMV path
(``src/triton/utils/quant/gemv.py``, ``matmul.py`` ``qbvm``): asymmetric
(scale, mn) quantization along the last dim with a group size, codes packed
by bit-shift into int32 words.

On TPU the pack/unpack is plain vectorized shift/OR on the VPU (int32 lanes;
no warp shuffles), and the quantized "GEMV" is an unpack-then-MXU-dot — the
in-kernel fused variant lives in ops/attention.py (k_packed_int4) and
ops/decode.py; these host-level forms serve cache serialization, checkpoint
size, and the WQLinear-style weight path.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops.reference import round_away


def pack_along_last_dim(codes: jax.Array, bits: int) -> jax.Array:
    """Pack unsigned ``codes`` (< 2^bits, int32) along the last dim into
    int32 words, ``feat_per_int = 32 // bits`` codes per word (reference
    ``_pack_along_last_dim``, new_pack.py:198-219)."""
    assert bits in (2, 4, 8), bits
    fpi = 32 // bits
    *lead, d = codes.shape
    assert d % fpi == 0, (d, fpi)
    c = codes.astype(jnp.uint32).reshape(*lead, d // fpi, fpi)
    shifts = (jnp.arange(fpi, dtype=jnp.uint32) * bits).reshape(
        (1,) * (c.ndim - 1) + (fpi,)
    )
    words = jnp.bitwise_or.reduce(c << shifts, axis=-1) if hasattr(jnp.bitwise_or, "reduce") else None
    if words is None:
        acc = jnp.zeros(c.shape[:-1], jnp.uint32)
        for i in range(fpi):
            acc = acc | (c[..., i] << jnp.uint32(i * bits))
        words = acc
    return words.astype(jnp.int32)


def unpack_along_last_dim(words: jax.Array, bits: int) -> jax.Array:
    """Inverse of :func:`pack_along_last_dim` -> int32 codes
    (reference ``unpack_tensor``, new_pack.py:222-244)."""
    fpi = 32 // bits
    mask = jnp.uint32(2**bits - 1)
    w = words.astype(jnp.uint32)[..., None]  # [*, W, 1]
    shifts = (jnp.arange(fpi, dtype=jnp.uint32) * bits).reshape(
        (1,) * (w.ndim - 1) + (fpi,)
    )
    codes = (w >> shifts) & mask
    return codes.reshape(*words.shape[:-1], words.shape[-1] * fpi).astype(jnp.int32)


def quantize_and_pack_along_last_dim(
    x: jax.Array, *, group_size: int, bits: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric group quant + pack (reference
    ``triton_quantize_and_pack_along_last_dim``, new_pack.py:247-300).

    Returns ``(packed int32 [*, D*bits/32], scale [*, D/group], mn [*, D/group])``
    with ``code = clip(round((x - mn)/scale), 0, 2^bits-1)``.
    """
    *lead, d = x.shape
    assert d % group_size == 0
    xg = x.astype(jnp.float32).reshape(*lead, d // group_size, group_size)
    mn = jnp.min(xg, axis=-1)
    mx = jnp.max(xg, axis=-1)
    scale = (mx - mn) / (2**bits - 1)
    scale = jnp.where(scale == 0, 1.0, scale)
    codes = jnp.clip(
        round_away((xg - mn[..., None]) / scale[..., None]), 0, 2**bits - 1
    ).astype(jnp.int32)
    packed = pack_along_last_dim(codes.reshape(*lead, d), bits)
    return packed, scale, mn


def unpack_and_dequant_along_last_dim(
    packed: jax.Array, scale: jax.Array, mn: jax.Array, *, group_size: int, bits: int
) -> jax.Array:
    """Inverse: ``x ≈ code * scale + mn`` (reference
    ``unpack_and_dequant_*cache``, new_pack.py:68-195)."""
    codes = unpack_along_last_dim(packed, bits)
    *lead, d = codes.shape
    cg = codes.astype(jnp.float32).reshape(*lead, d // group_size, group_size)
    out = cg * scale[..., None] + mn[..., None]
    return out.reshape(*lead, d)


# ---------------------------------------------------------------------------
# Quantized matmul (KIVI gemv / qbvm equivalents)
# ---------------------------------------------------------------------------


def quantized_matmul(
    x: jax.Array,
    packed_w: jax.Array,
    scale: jax.Array,
    mn: jax.Array,
    *,
    group_size: int,
    bits: int,
) -> jax.Array:
    """``x @ W^T`` with W stored packed (reference ``gemv_forward_cuda`` /
    ``qbvm``, gemv_cuda.cu:60-565, matmul.py:8-247). W layout ``[N, K]``
    packed along K. On TPU: vectorized unpack then one MXU matmul — the
    bandwidth saving of the packed weight is preserved; the arithmetic runs
    at full MXU rate instead of a hand-rolled GEMV."""
    w = unpack_and_dequant_along_last_dim(
        packed_w, scale, mn, group_size=group_size, bits=bits
    )  # [N, K] f32
    return jnp.einsum("...k,nk->...n", x.astype(jnp.float32), w).astype(x.dtype)


class WQLinear:
    """Weight-quantized linear layer (reference ``qmodule.WQLinear``,
    qmodule.py:6-159): functional holder of packed weights.

    ``backend="fused"`` stores the parts-of-K byte layout and runs the
    Pallas fused kernel (ops/gemv.py — packed bytes stream through VMEM
    once); ``"host"`` keeps the KIVI int32-word layout with
    unpack-then-MXU-matmul (the cache-interchange format).

    ``trainable=True`` makes the layer differentiable wrt its INPUT (and
    bias) with the quantization params frozen (``stop_gradient`` on
    packed/scale/mn for BOTH backends) — the reference's
    ``WQLinearForTrain`` / ``MatMul4Bit`` autograd function
    (qmodule.py:33-112): backward is ``g @ W_deq`` through the
    dequantized weight. The host backend differentiates natively (jnp
    dequant + einsum under autodiff, forward-mode included); the fused
    backend routes through ``gemv.wq_matmul_trainable``'s custom_vjp
    (reverse-mode only)."""

    def __init__(self, packed_w, scale, mn, bias, group_size: int, bits: int,
                 backend: str = "host", trainable: bool = False):
        self.packed_w = packed_w
        self.scale = scale
        self.mn = mn
        self.bias = bias
        self.group_size = group_size
        self.bits = bits
        self.backend = backend
        self.trainable = trainable

    @classmethod
    def from_dense(cls, w: jax.Array, bias=None, *, group_size: int = 128,
                   bits: int = 4, backend: str = "host", trainable: bool = False):
        if backend == "fused":
            from lowbit_quant_fa2_paddle_tpu.ops import gemv

            packed, scale, mn = gemv.pack_weights(w, group_size=group_size, bits=bits)
        else:
            packed, scale, mn = quantize_and_pack_along_last_dim(
                w, group_size=group_size, bits=bits
            )
        return cls(packed, scale, mn, bias, group_size, bits, backend, trainable)

    def __call__(self, x: jax.Array) -> jax.Array:
        pw, sc, mn = self.packed_w, self.scale, self.mn
        if self.trainable:  # freeze quantization params on EVERY backend
            pw = jax.lax.stop_gradient(pw)
            sc = jax.lax.stop_gradient(sc)
            mn = jax.lax.stop_gradient(mn) if mn is not None else None
        if self.backend == "fused":
            from lowbit_quant_fa2_paddle_tpu.ops import gemv

            mm = gemv.wq_matmul_trainable if self.trainable else gemv.wq_matmul_fused
            y = mm(
                x, pw, sc, mn,
                bits=self.bits, group_size=self.group_size,
            )
        else:
            y = quantized_matmul(
                x, pw, sc, mn,
                group_size=self.group_size, bits=self.bits,
            )
        if self.bias is not None:
            y = y + self.bias
        return y
