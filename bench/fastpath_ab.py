"""Within-process A/B of the decode interior-page fast path (unmasked
compute on fully-visible grid steps) vs the always-masked chain.

Interleaved min-of-rounds per the sub-ms flapping rule (verify skill):
each round measures every variant once; per-variant result = min over
rounds. Usage: python bench/fastpath_ab.py [--seq 131072] [--rounds 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=131072)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--windows", type=int, nargs="*", default=[0, 8192],
                    help="window sizes to A/B (0 = full attention)")
    ap.add_argument("--sink", type=int, default=0)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    b, h, hk, d, s = 1, 32, 8, 128, args.seq
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hk, s, d), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)
    kc, ks = quant_int8(k, gran="per_token")
    vc, vs = quant_int8(v, gran="per_token")
    jax.block_until_ready((kc, vc))
    fargs = (q, kc, vc, ks, vs, lengths)

    rows = []
    for window in args.windows:
        win = window or None
        variants = {}
        for name, fi in (("fast", True), ("masked", False)):
            variants[name] = jax.jit(
                lambda q, kk, vv, ksx, vsx, l, fi=fi, win=win: dec.decode_attention(
                    q, kk, vv, ksx, l, v_scale=vsx, window_size=win,
                    sink_size=args.sink, fast_interior=fi,
                )
            )
        for f in variants.values():
            jax.block_until_ready(f(*fargs))  # compile outside the clock

        best = {n: float("inf") for n in variants}
        for r in range(args.rounds):
            for n, f in variants.items():
                ms = measure_op_time(f, fargs, r1=60, r2=180, samples=8) * 1e3
                best[n] = min(best[n], ms)
                print(f"round {r} {n}: {ms:.4f} ms (best {best[n]:.4f})")
        ratio = best["masked"] / best["fast"]
        print(
            f"RESULT seq={s} window={window}: fast {best['fast']:.4f} ms | "
            f"masked {best['masked']:.4f} ms | fast is {ratio:.3f}x"
        )
        rows.append(dict(
            bench=f"decode_int8_b{b}h{h}hk{hk}d{d}s{s}",
            window=window, sink=args.sink,
            fast_ms=round(best["fast"], 4), masked_ms=round(best["masked"], 4),
            fast_speedup=round(ratio, 3),
        ))
    if args.json:
        dev = jax.devices()[0].device_kind
        with open(args.json, "w") as fh:
            json.dump({"device": dev, "rows": rows}, fh, indent=1)
        print(f'{{"saved": "{args.json}"}}')


if __name__ == "__main__":
    main()
