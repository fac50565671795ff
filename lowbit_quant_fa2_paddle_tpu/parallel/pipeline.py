"""Pipeline parallelism over a 'pp' mesh axis (GPipe-style microbatching).

The reference gets pipeline parallelism from external xDiT PipeFusion
(``--pipefusion_parallel_degree`` / ``--num_pipeline_patch``,
example/parallel_sageattn_cogvideo.py:85). TPU-native version: the layer
stack is split into P stages, one per device along 'pp'; microbatches flow
stage-to-stage via ``jax.lax.ppermute`` over ICI with the classic
(M + P - 1)-step schedule. Works with any per-stage function — here wired
to the DiT block stack.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x_microbatches: jax.Array,  # [M, mb, ...] local copy on every stage
    *,
    axis_name: str = "pp",
):
    """Run the pipeline inside shard_map.

    ``stage_fn(stage_params, x) -> x`` applies one stage's layers.
    ``stage_params`` are the LOCAL stage's parameters (already sharded by
    the caller's in_specs). Every device receives all M microbatches (the
    input is replicated); only stage 0's injections matter — later stages
    consume what arrives over the ring. Returns the final outputs
    ``[M, mb, ...]`` (valid on every device after the closing broadcast).
    """
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    m = x_microbatches.shape[0]
    steps = m + n_stages - 1
    perm = None  # deferred: ring neighbours

    buf = jnp.zeros_like(x_microbatches)  # outputs of the LAST stage
    state = jnp.zeros_like(x_microbatches[0])  # in-flight activation

    for t in range(steps):
        mb_idx = t - stage  # which microbatch this stage works on at step t
        active = jnp.logical_and(mb_idx >= 0, mb_idx < m)
        # Stage 0 injects a fresh microbatch; others use the arrived state.
        inject = jnp.logical_and(stage == 0, active)
        mb_clamped = jnp.clip(mb_idx, 0, m - 1)
        x_in = jnp.where(inject, x_microbatches[mb_clamped], state)
        y = stage_fn(stage_params, x_in)
        y = jnp.where(active, y, state)
        # Last stage banks its finished microbatch.
        done = jnp.logical_and(stage == n_stages - 1, active)
        buf = jnp.where(
            done[..., None] if done.ndim else done,
            buf.at[mb_clamped].set(y),
            buf,
        )
        if t < steps - 1:
            n = n_stages
            state = jax.lax.ppermute(
                y, axis_name, perm=[(i, (i + 1) % n) for i in range(n)]
            )

    # Broadcast the last stage's banked outputs to every stage: zero
    # elsewhere + psum (one collective at the very end).
    is_last = (stage == n_stages - 1).astype(buf.dtype)
    return jax.lax.psum(buf * is_last, axis_name)


def make_pipelined_dit(mesh: Mesh, cfg, *, axis_name: str = "pp", microbatches: int = 4):
    """Pipeline the DiT block stack over ``mesh``'s 'pp' axis.

    Returns ``fn(params, x, t) -> eps`` where ``params`` are ordinary
    init_dit_params output (depth divisible by the pp degree). The embed /
    final projections run replicated; blocks run pipelined.
    """
    from lowbit_quant_fa2_paddle_tpu.models import dit as dit_mod

    n_stages = mesh.shape[axis_name]
    assert cfg.depth % n_stages == 0, (cfg.depth, n_stages)
    per_stage = cfg.depth // n_stages

    def fn(params, x, t):
        b, s, d = x.shape
        c = dit_mod.timestep_embedding(t, cfg.time_embed_dim, cfg.dtype)
        c = dit_mod._dense(
            params["t_embed"]["out"],
            jax.nn.silu(dit_mod._dense(params["t_embed"]["in"], c)),
        )

        # Stack per-stage block params: leaves [n_stages, per_stage, ...]
        blocks = params["blocks"]
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(
                [jnp.stack(leaves[st * per_stage : (st + 1) * per_stage]) for st in range(n_stages)]
            ),
            *blocks,
        )

        assert b % microbatches == 0, (b, microbatches)
        mb = b // microbatches
        x_mb = x.reshape(microbatches, mb, s, d)
        # Conditioning travels per-step; pipelined stages process different
        # microbatches at different times, so we require a uniform timestep
        # across the batch (the standard diffusion-sampling case) and
        # broadcast its embedding.
        c_rep = jnp.broadcast_to(c[:1], (mb, c.shape[-1]))

        def stage_fn(stage_params, xm):
            # shard_map leaves a leading [1] stage dim on the local params.
            stage_params = jax.tree_util.tree_map(lambda a: a[0], stage_params)

            def body(xm, layer_params):
                return (
                    dit_mod.dit_block_forward(
                        layer_params, xm, c_rep, cfg, "exact", None
                    ),
                    None,
                )

            out, _ = jax.lax.scan(body, xm, stage_params)
            return out

        run = jax.shard_map(
            functools.partial(pipeline_apply, stage_fn, axis_name=axis_name),
            mesh=mesh,
            in_specs=(P(axis_name), P()),
            out_specs=P(),
            check_vma=False,
        )
        y = run(stacked, x_mb).reshape(b, s, d)
        return dit_mod._dense(params["final"], dit_mod._layer_norm(y))

    return fn
