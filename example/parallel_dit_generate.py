"""Multi-device DiT generation — the reference's
example/parallel_sageattn_cogvideo.py (xfuser degrees over torchrun/NCCL),
TPU-native: a jax.sharding mesh with the same degree knobs, XLA collectives
over ICI, no external launcher.

  python example/parallel_dit_generate.py --data 2 --seq 2 --model 2 \
      --seq-strategy ulysses --steps 10
(Run under XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
 PALLAS_AXON_POOL_IPS= for a virtual 8-device mesh.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lowbit_quant_fa2_paddle_tpu.models import dit
from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
from lowbit_quant_fa2_paddle_tpu.parallel.ring import ring_attention
from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import ulysses_attention


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=int, default=1, help="CFG/data-parallel degree")
    p.add_argument("--seq", type=int, default=2, help="sequence-parallel degree")
    p.add_argument("--model", type=int, default=1, help="head-TP degree")
    p.add_argument("--seq-strategy", default="ulysses", choices=["ulysses", "ring"])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--impl", default="int8")
    args = p.parse_args()

    mesh = make_mesh({"data": args.data, "seq": args.seq, "model": args.model})
    print(f"mesh: {dict(mesh.shape)} on {len(jax.devices())} devices")

    cfg = dit.tiny_config(num_heads=8, dim=512, depth=4)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)

    seq_attn = ulysses_attention if args.seq_strategy == "ulysses" else ring_attention

    def sharded_attention(q, k, v):
        from functools import partial
        import jax as _jax

        fn = partial(seq_attn, axis_name="seq")
        spec = P("data", "model", "seq", None)
        return _jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
        )(q, k, v)

    # monkey-patch the model's attention with the sharded strategy — the
    # in-repo analog of the reference's per-rank sdpa patching
    # (parallel_sageattn_cogvideo.py:45-54)
    orig = dit._attention
    dit._attention = lambda q, k, v, impl, interp: sharded_attention(q, k, v).astype(q.dtype)
    try:
        b = max(1, args.data)
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (b, args.seq_len, cfg.dim), cfg.dtype),
            NamedSharding(mesh, P("data", "seq", None)),
        )

        @jax.jit
        def step_fn(x, t):
            return x - 0.1 * dit.dit_forward(params, x, t, cfg, attn_impl=args.impl)

        jax.block_until_ready(step_fn(x, jnp.array([1000.0] * b)))
        t0 = time.perf_counter()
        for i in range(args.steps):
            x = step_fn(x, jnp.array([1000.0 * (1.0 - i / args.steps)] * b))
        jax.block_until_ready(x)
        print(f"{args.steps} sharded steps ({args.seq_strategy}): "
              f"{time.perf_counter()-t0:.2f}s")
    finally:
        dit._attention = orig


if __name__ == "__main__":
    main()
