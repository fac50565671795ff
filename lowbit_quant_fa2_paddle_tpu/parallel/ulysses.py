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

from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    attn_fn: Optional[Callable] = None,
    is_causal: bool = False,
    interpret: Optional[bool] = None,
    **attn_kw,
):
    """Call inside shard_map with q/k/v sharded on the sequence axis
    (local [B, H, S/n, D]). num_heads must be divisible by the axis size
    (same constraint the reference checks, parallel_sageattn_cogvideo.py:37-41).
    """
    # Head-divisibility is enforced at trace time by the all_to_all reshape.
    if attn_fn is None:
        attn_fn = functools.partial(
            lowbit_fa_qk_int8_pv_fp16, is_causal=is_causal, interpret=interpret, **attn_kw
        )

    def fwd(x):  # [B,H,S/n,D] -> [B,H/n,S,D]
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    def bwd(x):  # [B,H/n,S,D] -> [B,H,S/n,D]
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

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
