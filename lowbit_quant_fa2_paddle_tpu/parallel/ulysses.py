"""Ulysses-style sequence parallelism: all-to-all between seq- and
head-sharding around a local attention call.

The reference consumes this from xDiT (`--ulysses_degree`,
example/run_parallel.sh:38, with the heads-divisibility check at
parallel_sageattn_cogvideo.py:37-41). TPU-native version: two
``jax.lax.all_to_all`` reshards over the 'seq' ICI axis — seq-sharded
[B,H,S/n,D] -> head-sharded [B,H/n,S,D], local quantized attention over the
full sequence, then the inverse reshard.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16
from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    lowbit_attention,
    lowbit_attention_km,
)
from lowbit_quant_fa2_paddle_tpu.ops.reference import round_away


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    attn_fn: Optional[Callable] = None,
    is_causal: bool = False,
    wire_bits: Optional[int] = None,
    smooth_k: bool = True,
    kernel_space: str = "k",
    interpret: Optional[bool] = None,
    **attn_kw,
):
    """Call inside shard_map with q/k/v sharded on the sequence axis
    (local [B, H, S/n, D]). num_heads must be divisible by the axis size
    (same constraint the reference checks, parallel_sageattn_cogvideo.py:37-41).

    ``wire_bits=8`` quantizes BEFORE the reshard, so the all-to-alls move
    int8 codes + scale rows instead of three bf16 tensors — half the ICI
    bytes, and the quantization work itself is spread over the seq shards.
    Per-token Q/K scales travel with their tokens; V uses ONE global
    per-channel scale (an amax pmax over the axis) so codes from different
    source shards stay mutually consistent after the head reshard.
    """
    # Head-divisibility is enforced at trace time by the all_to_all reshape.
    def fwd(x, seq_axis=2):  # [B,H,S/n,...] -> [B,H/n,S,...]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=seq_axis, tiled=True
        )

    def bwd(x):  # [B,H/n,S,D] -> [B,H,S/n,D]
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    if wire_bits == 8:
        assert attn_fn is None, "wire_bits selects the built-in int8 kernel"
        k_major = kernel_space == "k"
        n = jax.lax.psum(1, axis_name)
        km = None
        if smooth_k:
            k_sum = jnp.sum(k.astype(jnp.float32), axis=2, keepdims=True)
            km = jax.lax.psum(k_sum, axis_name) / (n * k.shape[2])
        # K-major: Q^T codes straight from the quant kernel — the all-to-all
        # moves them with seq on the last axis; K rides natural (the K-major
        # kernel never wants K^T).
        q_codes, q_scale = quant_ops.quant_int8(
            q, gran="per_token", layout="ds" if k_major else "ns", interpret=interpret
        )
        k_codes, k_scale = quant_ops.quant_int8(
            k, km, gran="per_token", interpret=interpret
        )
        # Global per-channel V scale: local amax -> pmax over the axis.
        vf = v.astype(jnp.float32)
        amax = jax.lax.pmax(jnp.max(jnp.abs(vf), axis=2), axis_name)  # [B,H,D]
        v_scale = amax / quant_ops.INT8_QMAX + quant_ops.EPS
        v_codes = jnp.clip(
            round_away(vf / v_scale[:, :, None, :]),
            -quant_ops.INT8_QMAX,
            quant_ops.INT8_QMAX,
        ).astype(jnp.int8)
        # v_scale is seq-invariant; the head reshard just takes this chip's
        # head slice of it.
        idx = jax.lax.axis_index(axis_name)
        h_loc = v.shape[1] // n  # kv heads per chip (GQA-aware)
        vs_local = jax.lax.dynamic_slice_in_dim(v_scale, idx * h_loc, h_loc, 1)
        if k_major:
            # V^T codes on the wire (local [B,H,D,S/n] transpose of the int8
            # codes is O(S/n) per chip); O^T from the kernel is transposed
            # back locally before the inverse reshard.
            oT = lowbit_attention_km(
                fwd(q_codes, seq_axis=3),
                fwd(k_codes),
                fwd(jnp.swapaxes(v_codes, 2, 3), seq_axis=3),
                fwd(q_scale[..., None])[..., 0],
                fwd(k_scale[..., None])[..., 0],
                v_scale=vs_local,
                is_causal=is_causal,
                out_dtype=v.dtype,
                interpret=interpret,
                **attn_kw,
            )
            return bwd(jnp.swapaxes(oT, 2, 3))
        o = lowbit_attention(
            fwd(q_codes),
            fwd(k_codes),
            fwd(v_codes),
            fwd(q_scale[..., None])[..., 0],
            fwd(k_scale[..., None])[..., 0],
            v_scale=vs_local,
            is_causal=is_causal,
            out_dtype=v.dtype,
            interpret=interpret,
            **attn_kw,
        )
        return bwd(o)

    if attn_fn is None:
        attn_fn = functools.partial(
            lowbit_fa_qk_int8_pv_fp16, is_causal=is_causal, interpret=interpret, **attn_kw
        )
    o = attn_fn(fwd(q), fwd(k), fwd(v))
    return bwd(o)


def make_ulysses_attention(mesh, *, axis_name: str = "seq", **kw):
    """shard_map-wrapped Ulysses attention over ``mesh``; global [B,H,S,D]
    inputs sharded on the seq axis."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    fn = functools.partial(ulysses_attention, axis_name=axis_name, **kw)
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
        )
    )
