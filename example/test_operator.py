"""Operator smoke test CLI — the reference's example/test_sageattn_operator.py
(random inputs, both layouts, causal flag, latency + TFLOP/s + MSE vs exact).

  python example/test_operator.py --bits int8 --tensor_layout NHD --causal
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity, mse
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)
from lowbit_quant_fa2_paddle_tpu.utils.parser import bench_parser, save_name


def main():
    p = bench_parser()
    p.add_argument("--tensor_layout", default="HND", choices=["HND", "NHD"])
    p.add_argument("--seq", type=int, default=1024)
    args = p.parse_args()

    b, h, d, s = args.batch_size, args.num_heads, args.head_dim, args.seq
    shape = (b, h, s, d) if args.tensor_layout == "HND" else (b, s, h, d)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)

    fn = lambda q, k, v: lq.lowbit_fa_attn(
        q, k, v, bits=args.bits, tensor_layout=args.tensor_layout, is_causal=args.causal
    )
    o = jax.jit(fn)(q, k, v)

    qh, kh, vh = (
        (jnp.swapaxes(x, 1, 2) if args.tensor_layout == "NHD" else x) for x in (q, k, v)
    )
    o_ref = attention_reference(qh, kh, vh, is_causal=args.causal)
    oh = jnp.swapaxes(o, 1, 2) if args.tensor_layout == "NHD" else o

    t = measure_op_time(fn, (q, k, v))
    flops = attention_flops(b, h, d, s, s, args.causal)
    print(
        f"[{save_name(args)}] layout={args.tensor_layout} causal={args.causal} "
        f"seq={s}: {t*1e3:.3f} ms | {tflops(flops, t):.1f} TFLOP/s | "
        f"mse={float(mse(oh, o_ref)):.3e} | cos={float(cosine_similarity(oh, o_ref)):.6f}"
    )


if __name__ == "__main__":
    main()
