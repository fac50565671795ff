"""Full kernel benchmark sweep — the reference's bench/ suite in one tool.

Mirrors utils/benchmark.py's shape: seq sweep, warmup+reps, TFLOP/s =
4*B*H*D*S^2(/2 causal)/t, accuracy vs an on-chip reference, JSON + table
output (reference bench/quant/bench_qk_int8_pv_fp16_triton.py etc.).

Usage:
  python bench/sweep.py --seq_lens 1024 4096 --bits int8 int4 --causal
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    flash_attention_fp,
    lowbit_attention,
    lowbit_attention_km,
    resolve_fp_schedule,
)
from lowbit_quant_fa2_paddle_tpu.ops.fused_kv import (
    fused_packed_kv_attention,
    quant_kv_grouped,
)
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity, mse
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def build_variant(bits, q, k, v, vq_int8, causal, space="k"):
    """Returns (fn, args, transposed_out) for one benchmark variant.
    Quantization happens outside the timed region (reference times the
    attention kernel only, utils/benchmark.py:236-266). ``space="k"`` runs
    the K-major (transposed-space) kernel — the API default — on its
    production layout (Q^T codes, natural K, V^T); ``"q"`` the Q-major one."""
    if bits == "fp":
        return (lambda a, b, c: flash_attention_fp(a, b, c, is_causal=causal), (q, k, v), False)
    km = space == "k"
    if bits == "int8_baseline":
        # Fake-scale diagnostic row (reference utils/benchmark.py:74-176):
        # real int8 codes but UNIT scales, isolating kernel cost from the
        # quantization pipeline — timing-only (output scale is wrong by
        # construction, so no accuracy columns).
        qc, qs = q_ops.quant_int8(q, gran="per_token", layout="ds" if km else "ns")
        kc, ks = q_ops.quant_int8(k, gran="per_token")
        qs1, ks1 = jnp.ones_like(qs), jnp.ones_like(ks)
        if km:
            return (
                lambda a, b, c, d, e: lowbit_attention_km(a, b, c, d, e, is_causal=causal),
                (qc, kc, jnp.swapaxes(v, 2, 3), qs1, ks1),
                True,
            )
        return (
            lambda a, b, c, d, e: lowbit_attention(a, b, c, d, e, is_causal=causal),
            (qc, kc, v, qs1, ks1),
            False,
        )
    if bits in ("int8", "int8_v8"):
        qc, qs = q_ops.quant_int8(q, gran="per_token", layout="ds" if km else "ns")
        kc, ks = q_ops.quant_int8(k, gran="per_token")
        if bits == "int8_v8":
            vc, vsc, _ = q_ops.quant_v_int8_per_channel(v)
            if km:
                vcT = jnp.swapaxes(vc, 2, 3)
                return (
                    lambda a, b, c, d, e: lowbit_attention_km(a, b, c, d, e, v_scale=vsc, is_causal=causal),
                    (qc, kc, vcT, qs, ks),
                    True,
                )
            return (
                lambda a, b, c, d, e: lowbit_attention(a, b, c, d, e, v_scale=vsc, is_causal=causal),
                (qc, kc, vc, qs, ks),
                False,
            )
        if km:
            return (
                lambda a, b, c, d, e: lowbit_attention_km(a, b, c, d, e, is_causal=causal),
                (qc, kc, jnp.swapaxes(v, 2, 3), qs, ks),
                True,
            )
        return (
            lambda a, b, c, d, e: lowbit_attention(a, b, c, d, e, is_causal=causal),
            (qc, kc, v, qs, ks),
            False,
        )
    if bits == "int4":
        qc, qs = q_ops.quant_int8(q, gran="per_token", layout="ds" if km else "ns")
        k4, ks = q_ops.quant_int4(k, gran="per_token")
        if km:
            return (
                lambda a, b, c, d, e: lowbit_attention_km(a, b, c, d, e, k_packed_int4=True, is_causal=causal),
                (qc, k4, jnp.swapaxes(v, 2, 3), qs, ks),
                True,
            )
        return (
            lambda a, b, c, d, e: lowbit_attention(a, b, c, d, e, k_pack_bits=4, is_causal=causal),
            (qc, k4, v, qs, ks),
            False,
        )
    if bits == "int2":
        qc, qs = q_ops.quant_int8(q, gran="per_token", layout="ds" if km else "ns")
        k2, ks = q_ops.quant_int2(k, gran="per_token")
        if km:
            return (
                lambda a, b, c, d, e: lowbit_attention_km(a, b, c, d, e, k_pack_bits=2, is_causal=causal),
                (qc, k2, jnp.swapaxes(v, 2, 3), qs, ks),
                True,
            )
        return (
            lambda a, b, c, d, e: lowbit_attention(a, b, c, d, e, k_pack_bits=2, is_causal=causal),
            (qc, k2, v, qs, ks),
            False,
        )
    if bits == "kivi4":
        kp, ks, km = quant_kv_grouped(k, bits=4, group=256)
        vp, vs, vm = quant_kv_grouped(v, bits=4, group=256)
        return (
            lambda *a: fused_packed_kv_attention(*a, bits=4, is_causal=causal,
                                                 kernel_space=space),
            (q, kp, vp, ks, km, vs, vm),
            False,
        )
    raise ValueError(bits)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_heads", type=int, default=32)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--seq_lens", type=int, nargs="+", default=[1024, 2048, 4096, 8192])
    p.add_argument("--bits", nargs="+", default=["fp", "int8", "int8_v8", "int4"],
                   choices=["fp", "int8", "int8_baseline", "int8_v8", "int4",
                            "int2", "kivi4"])
    p.add_argument("--causal", action="store_true")
    p.add_argument("--space", default="k", choices=["k", "q"],
                   help="kernel schedule: k-major (API default) or q-major")
    p.add_argument("--output", default=None)
    p.add_argument("--merge", action="store_true",
                   help="merge this run's rows into an existing --output "
                        "(keyed by bits/seq/causal; new rows replace old) — "
                        "long-seq rows land one process at a time, so the "
                        "matrix accumulates across runs")
    args = p.parse_args()

    results = []
    for s in args.seq_lens:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (args.batch_size, args.num_heads, s, args.head_dim)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], shape, jnp.bfloat16)
        flops = attention_flops(args.batch_size, args.num_heads, args.head_dim, s, s, args.causal)
        o_ref = None
        for bits in args.bits:
            fn, fargs, t_out = build_variant(bits, q, k, v, False, args.causal, args.space)
            o = jax.jit(fn)(*fargs)
            o = o[0] if isinstance(o, tuple) else o
            if t_out:
                o = jnp.swapaxes(o, 2, 3)
            if bits == "fp":
                o_ref = o
            # Sub-ms kernels need heavy rep counts on this transport
            # (latency spikes survive min-of-3 at the defaults — see the
            # verify-skill timing notes); scale reps down as seq grows.
            if s <= 2048:
                reps = dict(r1=60, r2=180, samples=8)
            elif s <= 8192:
                # r1=8/r2=24/samples=3 still flapped a 3.7 ms kernel by 1.6x
                # once; this is the floor that has held.
                reps = dict(r1=30, r2=90, samples=6)
            else:
                reps = dict(r1=2, r2=6, samples=2)
            t = measure_op_time(fn, fargs, **reps)
            row = {
                "bits": bits,
                "seq": s,
                "causal": args.causal,
                "bhd": [args.batch_size, args.num_heads, args.head_dim],
                # fp routes by head_dim since r4 — label with the actual
                # schedule, from the single source of truth
                "space": args.space if bits != "fp" else resolve_fp_schedule(
                    args.head_dim),
                "tflops": round(tflops(flops, t), 2),
                "ms": round(t * 1e3, 3),
            }
            if o_ref is not None and bits not in ("fp", "int8_baseline"):
                row["cos_vs_fp"] = round(float(cosine_similarity(o, o_ref)), 6)
                row["mse_vs_fp"] = float(mse(o, o_ref))
            results.append(row)
            print(json.dumps(row), flush=True)

    if args.output:
        rows = results
        if args.merge and os.path.exists(args.output):
            with open(args.output) as f:
                old = json.load(f)
            shape = [args.batch_size, args.num_heads, args.head_dim]
            for r in old:
                # Guard against merging a different-geometry run into this
                # artifact (e.g. a hd128 sweep pointed at the hd256 file —
                # the head_dim lives only in the filename, and a silent
                # replace would corrupt the matrix the plots/README read).
                # Pre-r5 rows lack the field; they are trusted as-is.
                if "bhd" in r and r["bhd"] != shape:
                    raise SystemExit(
                        f"--merge refused: {args.output} holds rows at "
                        f"b/h/d={r['bhd']} but this run is {shape}")

            def key(r):
                return (r["bits"], r["seq"], r.get("causal", False))

            fresh = {key(r) for r in results}
            rows = [r for r in old if key(r) not in fresh] + results
            rows.sort(key=lambda r: (r["seq"], r["bits"]))
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
