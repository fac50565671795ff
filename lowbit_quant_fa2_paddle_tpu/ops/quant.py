"""Quantization kernels (Pallas/TPU) feeding the low-bit attention kernels.

TPU-first re-design of the reference's quant layer:

* per-block INT8 with optional fused K-mean subtraction — reference
  src/triton/quant_per_block.py:132-248 and csrc/fused/fused.cu
  ``QuantInt8Kernel`` (fused.cu:65-201);
* per-token INT8 — the TPU analog of the reference's per-warp / per-thread
  granularity (src/triton/quant_per_thread.py): with no warps on TPU, the
  finest granularity that stays a cheap rank-1 rescale after the int32 MXU
  dot is one scale per token row;
* per-block / per-token INT4 packed two-nibbles-per-byte along head_dim
  (halved HBM traffic for K) — reference src/triton/quant_per_block.py:74-130;
* per-channel INT8 V with optional mean extraction (smooth-V) — the TPU
  analog of the reference's per-channel FP8 V path
  (src/quant.py:210-291, csrc/fused/fused.cu ``MeanScaleKernel``): V's
  per-channel scale commutes through the PV matmul, so it is applied in the
  attention-kernel epilogue exactly like the reference's fused v_scale.

Scale convention: every Q/K quantizer returns **per-token scale rows**
``[B, H, S]`` (per-block granularity simply repeats the block scalar across
its rows). This keeps one attention-kernel interface for every granularity,
with dequantization as a rank-1 (outer-product) rescale of the int32 logits.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lowbit_quant_fa2_paddle_tpu.ops.reference import round_away

INT8_QMAX = 127.0
INT4_QMAX = 7.0
INT2_QMAX = 1.0
EPS = 1e-7


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def default_interpret() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (the analog of the
    reference's TRITON_INTERPRETER=1 CPU test mode,
    script/run_triton_bench_qk_int4.sh:11)."""
    return not is_tpu_backend()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _qmax_for_bits(bits: int) -> float:
    return {8: INT8_QMAX, 4: INT4_QMAX, 2: INT2_QMAX}[bits]


def _mask_edge_rows(x: jax.Array, seq_len: int, block: int) -> jax.Array:
    """Zero out rows past the true sequence end in the (possibly partial)
    edge block. Seq dims are NOT physically padded to block multiples — the
    grid edge block reads whatever lies past the array end, and a garbage row
    would corrupt per-BLOCK scales (absmax / rms over the tile). Zeros
    reproduce the old zero-padding semantics exactly. Per-token scales don't
    need this (garbage rows only produce garbage rows, and their stores are
    masked), but the where-pass is ~free next to the quant math."""
    rows_left = seq_len - pl.program_id(2) * block
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < rows_left, x, 0.0)


# ---------------------------------------------------------------------------
# INT8 quantization kernel
# ---------------------------------------------------------------------------


def _quant_int8_kernel(
    x_ref,
    km_ref,
    codes_ref,
    scale_ref,
    *,
    per_token: bool,
    qmax: float,
    emit_t: bool = False,
    mask_edge: int = 0,
):
    x = x_ref[0, 0].astype(jnp.float32)  # [BLK, D]
    if mask_edge:
        x = _mask_edge_rows(x, mask_edge, x.shape[0])
    if km_ref is not None:
        x = x - km_ref[0, 0].astype(jnp.float32)  # fused smooth-K
    if per_token:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # [BLK, 1]
    else:
        amax = jnp.max(jnp.abs(x))  # scalar — one scale per block
        amax = jnp.full((x.shape[0], 1), amax, jnp.float32)
    scale = amax / qmax + EPS
    codes = round_away(x / scale)
    codes = jnp.clip(codes, -qmax, qmax)
    if emit_t:
        # Emit the codes pre-transposed [D, BLK]: the attention kernel
        # consumes K^T, and an in-VMEM f32 transpose here deletes the
        # whole-tensor XLA int8 transpose pass between quant and attention.
        codes_ref[0, 0] = codes.T.astype(jnp.int8)
    else:
        codes_ref[0, 0] = codes.astype(jnp.int8)
    scale_ref[0, 0] = scale  # [BLK, 1] column tile — no relayout


def _quant_int8_kernel_nokm(
    x_ref, codes_ref, scale_ref, *, per_token: bool, qmax: float, emit_t: bool = False, mask_edge: int = 0
):
    _quant_int8_kernel(
        x_ref,
        None,
        codes_ref,
        scale_ref,
        per_token=per_token,
        qmax=qmax,
        emit_t=emit_t,
        mask_edge=mask_edge,
    )


def quant_int8(
    x: jax.Array,
    km: Optional[jax.Array] = None,
    *,
    gran: str = "per_block",
    block: int = 128,
    backend: str = "auto",
    layout: str = "ns",
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric INT8 quantization of HND ``[B, H, S, D]``.

    ``km`` (optional ``[B, H, 1, D]``) is subtracted before quantization —
    the fused smooth-K path (reference quant_per_block_int8_fuse_sub_mean,
    csrc/fused/fused.cu:430-520).

    ``layout="ds"`` emits the codes pre-transposed as ``[B, H, D, S]`` — the
    layout the attention kernel's QK dot wants for K — straight from the
    quant kernel (the TPU analog of the reference's fused transpose+quant V
    pipeline, csrc/fused/fused.cu ``TransposePadPermuteKernel``; here applied
    to K to kill the inter-kernel XLA int8 transpose pass).

    Returns ``(codes int8 [B,H,S,D] ("ns") or [B,H,D,S] ("ds"),
    scale f32 [B,H,S])`` — per-token scale rows (see module docstring).
    """
    assert gran in ("per_block", "per_token"), gran
    assert layout in ("ns", "ds"), layout
    per_token = gran == "per_token"
    emit_t = layout == "ds"
    b, h, s, d = x.shape
    if backend == "auto":
        backend = "pallas"
    if interpret is None:
        interpret = default_interpret()

    if backend == "xla":
        codes, scale = _quant_int8_xla(x, km, per_token=per_token, block=block)
        if emit_t:
            codes = jnp.swapaxes(codes, 2, 3)
        return codes, scale

    if per_token:
        # ``block`` is only the grid tile here (scales are per row), and
        # small tiles starve the DMA pipeline: measured b4h32 s4096 hd64
        # block 128 -> 1.60 ms vs 1024 -> 0.68 ms. Stream in big tiles.
        block = max(block, min(1024, cdiv(s, 128) * 128))

    # No physical seq padding: the grid edge block is partial (Pallas masks
    # its stores) and the kernel zeroes rows past the seq end in-tile —
    # deleting two whole-tensor pad/slice HBM copies for non-multiple seqs
    # (measured 1.39 -> 0.79 ms at the 17776-token flagship shape).
    mask_edge = s if s % block != 0 else 0
    grid = (b, h, cdiv(s, block))

    in_specs = [
        pl.BlockSpec((1, 1, block, d), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM),
    ]
    args = [x]
    if km is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, d), lambda bi, hi, si: (bi, hi, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(km)
        kernel = functools.partial(
            _quant_int8_kernel, per_token=per_token, qmax=INT8_QMAX, emit_t=emit_t, mask_edge=mask_edge
        )
    else:
        kernel = functools.partial(
            _quant_int8_kernel_nokm, per_token=per_token, qmax=INT8_QMAX, emit_t=emit_t, mask_edge=mask_edge
        )

    if emit_t:
        codes_spec = pl.BlockSpec(
            (1, 1, d, block), lambda bi, hi, si: (bi, hi, 0, si), memory_space=pltpu.VMEM
        )
        codes_shape = jax.ShapeDtypeStruct((b, h, d, s), jnp.int8)
    else:
        codes_spec = pl.BlockSpec(
            (1, 1, block, d), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM
        )
        codes_shape = jax.ShapeDtypeStruct((b, h, s, d), jnp.int8)

    codes, scale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            codes_spec,
            # Scales travel in column layout [B,H,S,1]: the (BLK, 1) tile is
            # exactly the [BLK,1] column the kernels produce/consume, and the
            # [B,H,S,1] <-> [B,H,1,S] reinterpretations outside are free
            # reshapes (contiguous S-major either way).
            pl.BlockSpec((1, 1, block, 1), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            codes_shape,
            jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)
    return codes, scale[:, :, :, 0]


def _quant_int8_xla(x, km, *, per_token: bool, block: int, bits: int = 8):
    """Pure-XLA fallback (identical math; used for cross-checks)."""
    qmax = _qmax_for_bits(bits)
    b, h, s, d = x.shape
    xf = x.astype(jnp.float32)
    if km is not None:
        xf = xf - km.astype(jnp.float32)
    if per_token:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = amax / qmax + EPS
        codes = jnp.clip(round_away(xf / scale), -qmax, qmax).astype(jnp.int8)
        return codes, scale[..., 0]
    s_pad = cdiv(s, block) * block
    xp = jnp.pad(xf, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    xb = xp.reshape(b, h, s_pad // block, block, d)
    amax = jnp.max(jnp.abs(xb), axis=(3, 4), keepdims=True)
    scale = amax / qmax + EPS
    codes = jnp.clip(round_away(xb / scale), -qmax, qmax).astype(jnp.int8)
    codes = codes.reshape(b, h, s_pad, d)[:, :, :s]
    scale_rows = jnp.broadcast_to(scale[..., 0], (b, h, s_pad // block, block)).reshape(b, h, s_pad)
    return codes, scale_rows[:, :, :s]


# ---------------------------------------------------------------------------
# INT4 packed quantization (two nibbles per byte, halves-of-D packing)
# ---------------------------------------------------------------------------
#
# Packing scheme (TPU-first): byte ``i`` of a row holds column ``i`` of the
# first half of head_dim in its low nibble and column ``i + D/2`` in its high
# nibble. Unpacking is therefore two cheap shift/mask ops plus a lane concat
# (no lane interleave), and since the QK contraction is permutation-invariant
# over D *when Q and K use the same order*, keeping original column order
# means INT4 K composes with plain INT8 Q with no extra work. Contrast with
# the reference's row-pair packing (quant_per_block.py:74-130) which is
# shaped by Triton's per-row layout.


def _quant_int4_kernel(x_ref, km_ref, packed_ref, scale_ref, *, per_token: bool, mask_edge: int = 0):
    x = x_ref[0, 0].astype(jnp.float32)  # [BLK, D]
    if mask_edge:
        x = _mask_edge_rows(x, mask_edge, x.shape[0])
    if km_ref is not None:
        x = x - km_ref[0, 0].astype(jnp.float32)
    if per_token:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        amax = jnp.full((x.shape[0], 1), jnp.max(jnp.abs(x)), jnp.float32)
    scale = amax / INT4_QMAX + EPS
    codes = jnp.clip(round_away(x / scale), -INT4_QMAX, INT4_QMAX).astype(jnp.int32)
    d = x.shape[-1]
    lo = codes[:, : d // 2] & 0xF
    hi = codes[:, d // 2 :] & 0xF
    packed_ref[0, 0] = (lo | (hi << 4)).astype(jnp.int8)
    scale_ref[0, 0] = scale  # [BLK, 1] column tile


def _quant_int4_kernel_nokm(x_ref, packed_ref, scale_ref, *, per_token: bool, mask_edge: int = 0):
    _quant_int4_kernel(x_ref, None, packed_ref, scale_ref, per_token=per_token, mask_edge=mask_edge)


def quant_int4(
    x: jax.Array,
    km: Optional[jax.Array] = None,
    *,
    gran: str = "per_block",
    block: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric INT4 quantization with in-kernel nibble packing.

    Returns ``(packed int8 [B,H,S,D//2], scale f32 [B,H,S])``. Byte ``i``
    holds columns ``i`` (low nibble) and ``i + D/2`` (high nibble).
    """
    per_token = gran == "per_token"
    b, h, s, d = x.shape
    assert d % 2 == 0
    if interpret is None:
        interpret = default_interpret()
    mask_edge = s if s % block != 0 else 0
    grid = (b, h, cdiv(s, block))
    in_specs = [pl.BlockSpec((1, 1, block, d), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if km is not None:
        in_specs.append(pl.BlockSpec((1, 1, 1, d), lambda bi, hi, si: (bi, hi, 0, 0), memory_space=pltpu.VMEM))
        args.append(km)
        kernel = functools.partial(_quant_int4_kernel, per_token=per_token, mask_edge=mask_edge)
    else:
        kernel = functools.partial(_quant_int4_kernel_nokm, per_token=per_token, mask_edge=mask_edge)
    packed, scale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block, d // 2), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, 1), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d // 2), jnp.int8),
            jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)
    return packed, scale[:, :, :, 0]


def _quant_int2_kernel(x_ref, km_ref, packed_ref, scale_ref, *, per_token: bool, mask_edge: int = 0):
    x = x_ref[0, 0].astype(jnp.float32)  # [BLK, D]
    if mask_edge:
        # NOTE: zeroed edge rows enter the per-block RMS below — identical to
        # the old zero-padding semantics.
        x = _mask_edge_rows(x, mask_edge, x.shape[0])
    if km_ref is not None:
        x = x - km_ref[0, 0].astype(jnp.float32)
    # Lloyd-Max 3-level quantizer for ~gaussian data: representation points
    # at ±1.224*sigma (abs-max scaling would zero ~87% of N(0,1) values).
    if per_token:
        sig = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    else:
        sig = jnp.full((x.shape[0], 1), jnp.sqrt(jnp.mean(x * x)), jnp.float32)
    scale = 1.224 * sig + EPS
    codes = jnp.clip(round_away(x / scale), -INT2_QMAX, INT2_QMAX).astype(jnp.int32)
    d = x.shape[-1]
    q = d // 4  # quarters-of-D packing, 4 codes per byte
    b0 = codes[:, :q] & 0x3
    b1 = codes[:, q : 2 * q] & 0x3
    b2 = codes[:, 2 * q : 3 * q] & 0x3
    b3 = codes[:, 3 * q :] & 0x3
    packed_ref[0, 0] = (b0 | (b1 << 2) | (b2 << 4) | (b3 << 6)).astype(jnp.int8)
    scale_ref[0, 0] = scale


def _quant_int2_kernel_nokm(x_ref, packed_ref, scale_ref, *, per_token: bool, mask_edge: int = 0):
    _quant_int2_kernel(x_ref, None, packed_ref, scale_ref, per_token=per_token, mask_edge=mask_edge)


def quant_int2(
    x: jax.Array,
    km: Optional[jax.Array] = None,
    *,
    gran: str = "per_block",
    block: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric INT2 quantization (codes in {-1, 0, 1}) packed four codes
    per byte in quarters-of-D order (extends the INT4 halves scheme; the
    reference benchmarks an int2 variant, utils/benchmark.py:407-511).

    Returns ``(packed int8 [B,H,S,D//4], scale f32 [B,H,S])``.
    """
    per_token = gran == "per_token"
    b, h, s, d = x.shape
    assert d % 4 == 0
    if interpret is None:
        interpret = default_interpret()
    mask_edge = s if s % block != 0 else 0
    grid = (b, h, cdiv(s, block))
    in_specs = [pl.BlockSpec((1, 1, block, d), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM)]
    args = [x]
    if km is not None:
        in_specs.append(pl.BlockSpec((1, 1, 1, d), lambda bi, hi, si: (bi, hi, 0, 0), memory_space=pltpu.VMEM))
        args.append(km)
        kernel = functools.partial(_quant_int2_kernel, per_token=per_token, mask_edge=mask_edge)
    else:
        kernel = functools.partial(_quant_int2_kernel_nokm, per_token=per_token, mask_edge=mask_edge)
    packed, scale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block, d // 4), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block, 1), lambda bi, hi, si: (bi, hi, si, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d // 4), jnp.int8),
            jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)
    return packed, scale[:, :, :, 0]


def unpack_int2(packed: jax.Array) -> jax.Array:
    """Unpack 2-bit quarters-of-D codes back to int8 (host/test helper)."""
    p32 = packed.astype(jnp.int32)
    parts = [
        jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 30 - 2 * i), 30)
        for i in range(4)
    ]
    return jnp.concatenate(parts, axis=-1).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Unpack nibble-packed int4 codes back to int8 (host/test helper; the
    attention kernels unpack in-kernel)."""
    p32 = packed.astype(jnp.int32)  # sign-extends the byte
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(p32, 4)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Per-channel INT8 V (+ smooth-V) — analog of the reference FP8 V pipeline
# ---------------------------------------------------------------------------


def quant_v_int8_per_channel(
    v: jax.Array,
    *,
    smooth_v: bool = False,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Quantize V per channel (one scale per (B, H, d) column over the whole
    sequence), optionally extracting the per-channel mean first (smooth-V,
    reference src/quant.py:175-207 ``sub_mean`` + fused ``+v_mean`` epilogue).

    A per-channel scale commutes through ``P @ V``; the attention kernel
    applies it (and adds back the mean, weighted by the softmax row-sum of 1)
    in its epilogue. Implemented in plain XLA: it is a bandwidth-bound
    reduce+scale that XLA fuses into two passes on its own.

    Returns ``(codes int8 [B,H,S,D], v_scale f32 [B,H,D], v_mean f32 [B,H,D] | None)``.
    """
    vf = v.astype(jnp.float32)
    vm = None
    if smooth_v:
        vm = jnp.mean(vf, axis=2)  # [B,H,D]
        vf = vf - vm[:, :, None, :]
    amax = jnp.max(jnp.abs(vf), axis=2)  # [B,H,D]
    scale = amax / INT8_QMAX + EPS
    codes = jnp.clip(round_away(vf / scale[:, :, None, :]), -INT8_QMAX, INT8_QMAX).astype(jnp.int8)
    return codes, scale, vm


# ---------------------------------------------------------------------------
# Smooth-K mean (host-side companion of the fused path)
# ---------------------------------------------------------------------------


def k_mean(k: jax.Array) -> jax.Array:
    """Per-(B,H,D) mean of K over the sequence axis, ``[B,H,1,D]`` f32
    (reference src/core.py:292-304)."""
    return jnp.mean(k.astype(jnp.float32), axis=2, keepdims=True)
