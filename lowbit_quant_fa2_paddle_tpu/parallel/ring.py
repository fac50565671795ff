"""Ring attention over the 'seq' mesh axis with base-2 LSE merging.

The reference only *enables* ring attention — every kernel exports LSE "for
cases like Ring Attention" (reference src/core.py:123-125, 560-562) and the
actual ring lives in external xDiT (`--ring_degree`, example/run_parallel.sh).
Here the ring is native: KV shards rotate around the ICI ring via
``jax.lax.ppermute`` while each chip runs the quantized Pallas kernel on its
local Q against the visiting KV block, merging partial results with exactly
the base-2 LSE contract the kernels emit.

Design (TPU-first):
* K/V rotate as **quantized codes + scale rows**, not floats — halving (int8)
  or quartering (packed int4 K via ``k_bits=4``) ICI bytes per hop is a
  distributed win the reference's GPU kernels never had. ``v_bits=8`` also
  rotates V as per-channel int8 codes (V is otherwise the dominant bf16
  payload); the kernel's fused v_scale epilogue makes each partial
  self-contained, so LSE merging is unchanged.
* Smooth-K uses the **global** K mean (one psum of per-shard sums), so
  quantization matches the single-chip path bit-for-bit in distribution.
* Causal skip: block (src > self) contributes nothing; we zero its merge
  weight and skip its kernel via lax.cond.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    LOG2E,
    lowbit_attention,
    lowbit_attention_km,
)


def _merge(state, o_p, lse2_p, weight_on, transposed=False):
    """Streaming merge of a normalized partial (o_p, base-2 lse2_p) into
    (o_acc, l_acc, m) running state. The partial's unnormalized contribution
    is ``o_p * 2^lse2_p`` (same online-softmax algebra as in-kernel, lifted
    to the cross-chip level; reference's enabling contract src/core.py:123).
    ``transposed``: partials are O^T [B,H,D,S] (K-major kernel) — the merge
    weights broadcast along the D sublane axis instead of the last axis."""
    o_acc, l_acc, m = state
    lse2_p = jnp.where(weight_on, lse2_p, -jnp.inf)
    m_new = jnp.maximum(m, lse2_p)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    a = jnp.where(jnp.isfinite(m), jnp.exp2(m - m_safe), 0.0)
    b = jnp.where(jnp.isfinite(lse2_p), jnp.exp2(lse2_p - m_safe), 0.0)
    if transposed:
        o_acc = o_acc * a[:, :, None, :] + o_p.astype(jnp.float32) * b[:, :, None, :]
    else:
        o_acc = o_acc * a[..., None] + o_p.astype(jnp.float32) * b[..., None]
    l_acc = l_acc * a + b
    return o_acc, l_acc, m_new


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    is_causal: bool = False,
    # Sliding window (causal only): each q attends its previous
    # ``window_size`` global positions. Ring hops whose whole KV shard lies
    # below every local q's window are dropped STATICALLY — rotation stops
    # after ceil((window-1)/s_local) hops, so both the kernel work AND the
    # ICI traffic scale with the window, not the global sequence.
    window_size: Optional[int] = None,
    sm_scale: Optional[float] = None,
    smooth_k: bool = True,
    k_bits: int = 8,
    v_bits: Optional[int] = None,
    kernel_space: str = "k",
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    **kernel_kw,
):
    """Quantized ring attention. Call inside shard_map with q/k/v sharded on
    the sequence axis: local shapes ``[B, H, S/n, D]`` (HND). Sequence shards
    must be laid out in ring order (shard i holds positions [i*S/n,(i+1)S/n)).

    ``k_bits``: 8 (int8 K codes) or 4 (nibble-packed — quarter of a bf16
    ring's K bytes). ``v_bits``: None rotates float V; 8 rotates per-channel
    int8 V codes + a tiny [B,Hk,D] scale (halves the dominant V payload).
    ``kernel_space``: "k" (default) runs the K-major kernel every hop — KV
    rotates in exactly the natural/transposed layouts that kernel consumes,
    and partials merge as O^T; "q" keeps the Q-major kernel.
    """
    b, h, s_loc, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    k_major = kernel_space == "k"

    # Global smooth-K mean: psum of local sums over the ring.
    km = None
    if smooth_k:
        k_sum = jnp.sum(k.astype(jnp.float32), axis=2, keepdims=True)
        km = jax.lax.psum(k_sum, axis_name) / (n * k.shape[2])

    assert k_bits in (8, 4) and v_bits in (None, 8), (k_bits, v_bits)
    q_codes, q_scale = quant_ops.quant_int8(
        q, gran="per_token", layout="ds" if k_major else "ns", interpret=interpret
    )
    if k_bits == 4:
        k_codes, k_scale = quant_ops.quant_int4(
            k, km, gran="per_token", interpret=interpret
        )
    else:
        k_codes, k_scale = quant_ops.quant_int8(
            k, km, gran="per_token", interpret=interpret
        )
    v_scale = None
    if v_bits == 8:
        v, v_scale, _ = quant_ops.quant_v_int8_per_channel(v)
    if k_major:
        v = jnp.swapaxes(v, 2, 3)  # rotate V^T: the km kernel's layout

    o_shape = (b, h, d, s_loc) if k_major else (b, h, s_loc, d)
    o_acc = jnp.zeros(o_shape, jnp.float32)
    l_acc = jnp.zeros((b, h, s_loc), jnp.float32)
    m = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
    state = (o_acc, l_acc, m)

    perm = [(i, (i + 1) % n) for i in range(n)]
    k_blk, k_s_blk, v_blk, v_s_blk = k_codes, k_scale, v, v_scale

    window = None
    n_hops = n
    if window_size is not None:
        assert is_causal, "window_size requires is_causal"
        window = int(window_size)
        # Hop t's KV shard sits exactly t*s_loc behind the local Q shard
        # (for the causal src < idx contributions), so its CLOSEST (q, k)
        # distance is (t-1)*s_loc + 1; once that exceeds window - 1 the
        # hop — and every later hop — contributes nothing. Static, so the
        # rotation (and its ICI traffic) simply stops.
        if window >= 2:
            n_hops = min(n, 2 + (window - 2) // s_loc)
        else:
            n_hops = 1

    for t in range(n_hops):
        src = (idx - t) % n

        def attend(causal, q_off=0):
            fn = lowbit_attention_km if k_major else lowbit_attention
            return fn(
                q_codes,
                k_blk,
                v_blk,
                q_scale,
                k_s_blk,
                v_scale=v_s_blk,
                k_pack_bits=k_bits,
                is_causal=causal,
                window_size=window,
                q_position_offset=q_off,
                sm_scale=sm_scale,
                return_lse=True,
                out_dtype=jnp.float32,
                interpret=interpret,
                **kernel_kw,
            )

        if is_causal:
            if t == 0:
                o_p, lse2 = attend(True)  # diagonal block: local causal
                on = jnp.full((), True)
            else:
                # src < idx: visible with the static cross-shard offset
                # t*s_loc (causal there is trivially true when no window;
                # with a window the banded schedule prunes in-hop blocks
                # too); src > idx: fully masked (skip).
                run = src < idx
                o_p, lse2 = jax.lax.cond(
                    run,
                    lambda: attend(True, q_off=t * s_loc)
                    if window is not None
                    else attend(False),
                    lambda: (
                        jnp.zeros(o_shape, jnp.float32),
                        jnp.full((b, h, s_loc), -jnp.inf, jnp.float32),
                    ),
                )
                on = run
        else:
            o_p, lse2 = attend(False)
            on = jnp.full((), True)

        state = _merge(state, o_p, lse2, on, transposed=k_major)

        if t < n_hops - 1:
            # Rotate int8 KV codes + scale rows around the ring (half the
            # ICI bytes of a bf16 ring).
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            k_s_blk = jax.lax.ppermute(k_s_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            if v_s_blk is not None:
                v_s_blk = jax.lax.ppermute(v_s_blk, axis_name, perm)

    o_acc, l_acc, m = state
    l_safe = jnp.where(l_acc == 0.0, 1.0, l_acc)
    if k_major:
        o = (jnp.swapaxes(o_acc, 2, 3) / l_safe[..., None]).astype(q.dtype)
    else:
        o = (o_acc / l_safe[..., None]).astype(q.dtype)
    if return_lse:
        # natural-log LSE with the smooth-K correction, matching the
        # single-chip contract (reference src/core.py:344-350).
        lse = (m + jnp.log2(l_safe)) / LOG2E
        if km is not None:
            # GQA: broadcast the kv-head means to the q heads before the dot.
            kmq = jnp.repeat(km.astype(jnp.float32), h // km.shape[1], axis=1)
            corr = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kmq)[..., 0]
            lse = lse + corr * sm_scale
        return o, lse
    return o


def make_ring_attention(mesh, *, axis_name: str = "seq", is_causal: bool = False, **kw):
    """shard_map-wrapped ring attention over ``mesh``: global [B,H,S,D]
    inputs sharded on the seq axis."""
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    out_specs = (spec, P(None, None, axis_name)) if kw.get("return_lse") else spec

    fn = functools.partial(ring_attention, axis_name=axis_name, is_causal=is_causal, **kw)
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=out_specs, check_vma=False
        )
    )
