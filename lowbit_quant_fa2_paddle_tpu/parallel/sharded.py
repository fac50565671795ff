"""Head/batch-sharded attention wrappers and the strategy facade.

Maps the reference's xfuser degree flags (example/run_parallel.sh:36-43:
data/CFG-parallel, ulysses, ring, tensor degrees) onto mesh-axis strategies:

* 'data'  — batch sharding (data parallel and CFG-parallel: the cond/uncond
  pair is just batch 2; reference --use_cfg_parallel);
* 'model' — head-sharded tensor parallelism (zero-communication attention;
  GQA co-location when kv heads divide evenly);
* 'seq'   — Ulysses all-to-all or ring attention for long context.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16
from lowbit_quant_fa2_paddle_tpu.parallel.ring import ring_attention
from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import ulysses_attention


def make_head_parallel_attention(
    mesh: Mesh,
    *,
    data_axis: str = "data",
    model_axis: str = "model",
    attn_fn: Optional[Callable] = None,
    **attn_kw,
):
    """Batch over 'data', heads over 'model': attention itself needs no
    collectives (communication happens later in the caller's output
    projection). Global inputs [B, H, S, D]."""
    if attn_fn is None:
        attn_fn = functools.partial(lowbit_fa_qk_int8_pv_fp16, **attn_kw)
    spec = P(data_axis, model_axis, None, None)
    return jax.jit(
        jax.shard_map(
            attn_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
        )
    )


def fsdp_shardings(params, mesh: Mesh, *, axis: str = "data"):
    """Fully-sharded (ZeRO-3-style) parameter layout: each tensor's largest
    axis-divisible dimension is sharded over ``axis``; XLA all-gathers
    on use. The reference only ships an accelerate FSDP config
    (fsdp_runtime.yaml); here the layout is first-class. Weights that don't
    divide stay replicated."""
    import jax as _jax
    from jax.sharding import NamedSharding

    n = mesh.shape[axis]

    def spec_for(leaf):
        if leaf.ndim == 0:
            return P()
        dims = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
        for d in dims:
            if leaf.shape[d] % n == 0 and leaf.shape[d] >= n:
                spec = [None] * leaf.ndim
                spec[d] = axis
                return P(*spec)
        return P()

    return _jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, spec_for(leaf)), params
    )


def make_parallel_attention(
    mesh: Mesh,
    *,
    seq_strategy: str = "ulysses",  # 'ulysses' | 'ring' | 'none'
    is_causal: bool = False,
    data_axis: str = "data",
    seq_axis: str = "seq",
    model_axis: str = "model",
    **attn_kw,
):
    """Full facade: batch on 'data', heads on 'model', sequence on 'seq' via
    the chosen strategy — the in-repo equivalent of the reference's xfuser
    launcher degrees. Global [B, H, S, D] inputs sharded (data, model, seq)."""

    def local_attn(q, k, v):
        if seq_strategy == "ulysses":
            return ulysses_attention(
                q, k, v, axis_name=seq_axis, is_causal=is_causal, **attn_kw
            )
        if seq_strategy == "ring":
            return ring_attention(
                q, k, v, axis_name=seq_axis, is_causal=is_causal, **attn_kw
            )
        if seq_strategy == "none":
            return lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=is_causal, **attn_kw)
        raise ValueError(f"unknown seq_strategy {seq_strategy!r}")

    spec = P(data_axis, model_axis, seq_axis, None)
    return jax.jit(
        jax.shard_map(
            local_attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
        )
    )
