"""End-to-end DiT generation regression — the reference's bench/video_test
(sageattn_cogvideo_{int8,int4,multi,baseline}.py + attn_utils.get_video_loss):
generate latent "video" frames with each quantized attention mode and report
wall time + frame-tensor MSE vs the exact-attention baseline.

Usage:
  python bench/video_test.py [--steps 10] [--impl int8 int4] [--full-size]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.models import dit
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity, mse


def generate_latents(params, cfg, impl: str, steps: int, seq: int, key,
                     scan_blocks: bool = False):
    """Toy deterministic DDIM-ish denoise loop: enough to propagate
    attention error through `steps` iterations like the reference's 50-step
    CogVideoX run does."""
    x = jax.random.normal(key, (1, seq, cfg.dim), cfg.dtype)

    @jax.jit
    def step_fn(params, x, t):
        # params as an ARGUMENT: closing over them would bake every weight
        # into the HLO as literals (oversized compile payloads).
        eps = dit.dit_forward(params, x, t, cfg, attn_impl=impl,
                              scan_blocks=scan_blocks)
        return x - 0.1 * eps

    # compile outside the timed region — otherwise per-impl compile-cache
    # state skews the comparison (an early version reported a bogus 1.47x
    # this way). The warmup must force a VALUE fetch: on remote transports
    # both execution AND compilation are async past block_until_ready.
    warm = step_fn(params, x, jnp.array([1000.0]))
    float(warm.ravel()[0])

    t0 = time.perf_counter()
    for i in range(steps):
        t = jnp.array([1000.0 * (1.0 - i / steps)])
        x = step_fn(params, x, t)
    x = jax.block_until_ready(x)
    # force real completion: scalar fetch (block_until_ready can ack early
    # on remote transports — see utils/benchmark.py)
    float(x.ravel()[0])
    return x, time.perf_counter() - t0


def frame_loss(a, b):
    """Frame-tensor MSE (reference bench/video_test/attn_utils.py:6-26)."""
    return float(mse(a, b))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--impl", nargs="+", default=["fp", "int8", "int8_v8", "int4"])
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--full-size", action="store_true",
                   help="CogVideoX-2b geometry (30 heads x hd64, 17k tokens)")
    p.add_argument("--baseline", default=None,
                   help="baseline impl (default: exact; fp when --full-size "
                        "— exact attention would materialize a 37 GB logits tensor)")
    p.add_argument("--w-bits", type=int, default=0, choices=[0, 8, 4],
                   help="also run each impl with per-channel packed block "
                        "weights (fused gemv) at this precision")
    p.add_argument("--output", default=None)
    args = p.parse_args()

    if args.full_size:
        cfg = dit.cogvideox_2b_config(depth=4)  # 4 blocks: attention-dominated
        seq = 17776  # 49x480x720 video latent tokens (SURVEY §7.6)
        baseline_impl = args.baseline or "fp"
    else:
        cfg = dit.tiny_config(num_heads=8, dim=512, depth=2)
        seq = args.seq
        baseline_impl = args.baseline or "exact"

    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    baseline, t_base = generate_latents(params, cfg, baseline_impl, args.steps, seq, key,
                                        scan_blocks=args.full_size)
    # Memory accounting (reference reports elapsed + peak memory per run,
    # example/parallel_sageattn_cogvideo.py:96-104): device memory stats
    # where the backend exposes them, analytic byte accounting always
    # (the axon relay returns no memory_stats).
    from lowbit_quant_fa2_paddle_tpu.utils.benchmark import device_memory_stats

    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )
    lat_bytes = seq * cfg.dim * 2  # bf16 latent
    mem = {
        "param_bytes": int(param_bytes),
        "latent_bytes": int(lat_bytes),
        # per-step attention working set (q+k+v+o at the flagship shape)
        "attn_qkvo_bytes": int(4 * cfg.num_heads * seq * cfg.head_dim * 2),
    }
    mem.update(device_memory_stats())
    results = [{"impl": baseline_impl, "seconds": round(t_base, 3),
                "frame_mse": 0.0, "memory": mem}]
    print(json.dumps(results[0]), flush=True)

    run_params = [("", params)]
    if args.w_bits:
        run_params.append(
            (f"+w{args.w_bits}", dit.quantize_dit_params(params, bits=args.w_bits))
        )
    for impl in args.impl:
        for suffix, prm in run_params:
            out, t = generate_latents(prm, cfg, impl, args.steps, seq, key,
                                      scan_blocks=args.full_size)
            row = {
                "impl": impl + suffix,
                "seconds": round(t, 3),
                "frame_mse": frame_loss(out, baseline),
                "cos": round(float(cosine_similarity(out, baseline)), 6),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
