"""Distributed decode over sharded quantized KV caches.

The reference's decode experiments run under sglang's model-parallel init
(src/triton/utils/main.py:14-15) and its split-KV kernel merges partial
softmaxes across GPU SMs (quant_sglang_triton_attn.py stage 2). The TPU
version makes both first-class:

* **Context-sharded decode** (`make_context_sharded_decode`): one sequence's
  cache is sharded along the sequence axis across chips (long-context
  serving). Each chip runs the decode kernel over its local shard and the
  partials merge with the same base-2 LSE algebra as ring attention — here
  via `psum` (every chip needs the full output), the cross-device form of
  the reference's stage-2 softmax-reduce.
* **Head-sharded decode** (`make_head_sharded_decode`): the tensor-parallel
  layout — KV-head shards decode independently, no collectives (outputs
  concatenate along heads, which the surrounding TP projection consumes
  sharded anyway).

Both are shard_map wrappers, so they compose with the data axis for batch
parallelism.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import decode as dec


def context_sharded_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_scale: jax.Array,
    lengths: jax.Array,
    *,
    axis_name: str,
    v_scale: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    **kw,
):
    """Call inside shard_map: q replicated ``[B,H,D]``; caches sharded on
    the sequence axis (local ``[B,Hk,S/n,D]``, shard i holding positions
    ``[i*S/n, (i+1)*S/n)``); ``lengths`` = GLOBAL valid lengths ``[B]``.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    s_loc = k_cache.shape[2]
    # Local valid length of this shard: clamp(global - shard_start, 0, S/n).
    loc_len = jnp.clip(lengths - idx * s_loc, 0, s_loc).astype(jnp.int32)

    o_p, lse2 = dec.decode_attention(
        q,
        k_cache,
        v_cache,
        k_scale,
        loc_len,
        v_scale=v_scale,
        return_lse=True,
        interpret=interpret,
        **kw,
    )  # o_p [B,H,D] normalized local partial; lse2 [B,H] base-2

    # Cross-shard softmax merge (reference stage-2 reduce, across chips):
    # unnormalized contribution of shard i is o_i * 2^lse2_i.
    m = jax.lax.pmax(lse2, axis_name)
    w = jnp.exp2(lse2 - m)  # empty shards: lse2 ~ -1e30 -> w = 0
    o_num = jax.lax.psum(o_p.astype(jnp.float32) * w[..., None], axis_name)
    w_den = jax.lax.psum(w, axis_name)
    return (o_num / jnp.where(w_den == 0.0, 1.0, w_den)[..., None]).astype(q.dtype)


def make_context_sharded_decode(mesh, *, axis_name: str = "seq", **kw):
    """shard_map wrapper: global caches/scales sharded on ``axis_name``
    (dim 2), q/lengths replicated, replicated output."""
    from jax.sharding import PartitionSpec as P

    cache_spec = P(None, None, axis_name, None)
    scale_spec = P(None, None, axis_name)
    fn = functools.partial(context_sharded_decode, axis_name=axis_name, **kw)

    def wrapped(q, k_cache, v_cache, k_scale, lengths, v_scale):
        return jax.shard_map(
            lambda q_, kc, vc, ks, l, vs: fn(q_, kc, vc, ks, l, v_scale=vs),
            mesh=mesh,
            in_specs=(P(), cache_spec, cache_spec, scale_spec, P(), scale_spec),
            out_specs=P(),
            check_vma=False,
        )(q, k_cache, v_cache, k_scale, lengths, v_scale)

    return jax.jit(wrapped)


def make_head_sharded_decode(mesh, *, axis_name: str = "model", **kw):
    """Tensor-parallel decode: q heads + KV-head caches sharded on
    ``axis_name``; no collectives (each shard's heads are independent)."""
    from jax.sharding import PartitionSpec as P

    q_spec = P(None, axis_name, None)
    cache_spec = P(None, axis_name, None, None)
    scale_spec = P(None, axis_name, None)

    def wrapped(q, k_cache, v_cache, k_scale, lengths, v_scale):
        return jax.shard_map(
            lambda q_, kc, vc, ks, l, vs: dec.decode_attention(
                q_, kc, vc, ks, l, v_scale=vs, **kw
            ),
            mesh=mesh,
            in_specs=(q_spec, cache_spec, cache_spec, scale_spec, P(), scale_spec),
            out_specs=q_spec,
            check_vma=False,
        )(q, k_cache, v_cache, k_scale, lengths, v_scale)

    return jax.jit(wrapped)
