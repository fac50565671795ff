"""Single-chip DiT generation with low-bit attention — the reference's
example/sageattn_cogvideo.py (monkey-patched sdpa + 50-step CogVideoX run,
timing + output export). Here the model is in-repo; the attention
implementation is a flag, and output latents are saved as .npy.

  python example/dit_generate.py --impl int8 --steps 50 [--full-size]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import dit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="int8",
                   choices=["exact", "fp", "int8", "int8_v8", "int4", "int8_t", "int4_t"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--full-size", action="store_true",
                   help="CogVideoX-2b geometry: 30 heads x hd64, 17k tokens")
    p.add_argument("--out", default="latents.npy")
    args = p.parse_args()

    if args.full_size:
        cfg = dit.cogvideox_2b_config()
        seq = 17776
    else:
        cfg = dit.tiny_config(num_heads=8, dim=512, depth=4)
        seq = args.seq

    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, seq, cfg.dim), cfg.dtype)

    @jax.jit
    def step_fn(params, x, t):
        return x - 0.1 * dit.dit_forward(params, x, t, cfg, attn_impl=args.impl,
                                         scan_blocks=args.full_size)

    # compile outside the timed loop
    jax.block_until_ready(step_fn(params, x, jnp.array([1000.0])))
    t0 = time.perf_counter()
    for i in range(args.steps):
        x = step_fn(params, x, jnp.array([1000.0 * (1.0 - i / args.steps)]))
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps with attn_impl={args.impl}: {dt:.2f}s "
          f"({dt/args.steps*1e3:.1f} ms/step)")
    np.save(args.out, np.asarray(x, dtype=np.float32))
    print(f"latents -> {args.out}")


if __name__ == "__main__":
    main()
