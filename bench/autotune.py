"""Block-size autotuner for the attention kernels.

Sweeps (block_q, block_kv) for a given shape/schedule on the current device
and prints one JSON line per config plus the winner. The reference tunes
per-kernel constants statically (num_warps/stages tables in every Triton
file, e.g. attn_qk_int8_per_block.py:169-238); here the grid is a runtime
sweep because Mosaic compiles any block shape on demand.

Usage:
  python bench/autotune.py --seq 4096 --space k
  python bench/autotune.py --seq 17776 --batch 1 --heads 30 --causal
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
    lowbit_attention,
    lowbit_attention_km,
)
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def _poisoned(e: Exception) -> bool:
    """Only REMOTE-COMPILE failures poison the rest of the process's
    timings (HTTP 500 from the compile helper — measured 20-70% slow
    afterwards). An ordinary Mosaic rejection (VMEM cap, block rules) is
    an expected sweep outcome and does not taint the other configs."""
    msg = str(e)
    return "remote_compile" in msg or "HTTP 500" in msg


def tune_decode(args):
    """Sweep block_kv x heads_per_step for the decode kernel at one
    (cache precision, Hk, head_dim, context) point; persist the winner
    keyed by pow2 context bucket (ops/decode.py consults it whenever
    block_kv/heads_per_step are left unset). Demotes the r3 ~2MB/step
    heuristic to fallback (VERDICT r3 #5)."""
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.utils import tuning
    from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time

    kb, vb = {"16": (16, 16), "8": (8, 8), "4": (4, 4), "k4v8": (4, 8)}[
        args.kv_bits
    ]
    b, h, hk, d, s = args.batch, args.heads, args.kv_heads, args.head_dim, args.seq
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qv = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.bfloat16)
    kq, ksx = dec.quantize_token(k, bits=kb)
    vq, vsx = dec.quantize_token(v, bits=vb)
    lengths = jnp.full((b,), s, jnp.int32)
    jax.block_until_ready((kq, vq))
    best = None
    errored = False
    blocks = args.decode_block_kv or [1024, 2048, 4096, 8192]
    for bkv in blocks:
        if s % bkv:
            continue
        for hb in args.heads_per_step:
            if hk % hb:
                continue
            fn = jax.jit(
                lambda q, kc, vc, ksc, vsc, l, _bk=bkv, _hb=hb: dec.decode_attention(
                    q, kc, vc, ksc, l, v_scale=vsc, k_bits=kb, v_bits=vb,
                    block_kv=_bk, heads_per_step=_hb,
                )
            )
            fargs = (qv, kq, vq, ksx, vsx, lengths)
            try:
                jax.block_until_ready(fn(*fargs))
            except Exception as e:
                errored |= _poisoned(e)
                print(json.dumps({"block_kv": bkv, "heads_per_step": hb,
                                  "error": str(e)[:120]}), flush=True)
                continue
            t = measure_op_time(fn, fargs, r1=60, r2=180, samples=8)
            row = {"block_kv": bkv, "heads_per_step": hb,
                   "us": round(t * 1e6, 1)}
            print(json.dumps(row), flush=True)
            if best is None or row["us"] < best["us"]:
                best = row
    print(json.dumps({"best": best, "space": "decode", "kv_bits": args.kv_bits,
                      "seq": s}), flush=True)
    if args.save and best is not None and errored and not args.save_despite_errors:
        print(json.dumps({"not_saved": "remote-compile failure poisoned "
                          "this process's timings; re-measure in a fresh "
                          "process or pass --save-despite-errors"}), flush=True)
        return
    if args.save and best is not None:
        path = tuning.record(
            f"decode_k{kb}v{vb}", d, tuning.pow2_bucket(s), False,
            0, best["block_kv"],
            extra={"heads_per_step": best["heads_per_step"],
                   "us": best["us"]},
        )
        print(json.dumps({"saved": path}), flush=True)


def tune_gemv(args):
    """Sweep the fused weight-quantized matmul's N tile at one (bits, K, N)
    point (ops/gemv.py consults the winner when block_n is unset)."""
    from lowbit_quant_fa2_paddle_tpu.ops import gemv
    from lowbit_quant_fa2_paddle_tpu.utils import tuning
    from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time

    kdim, n, m = args.gemv_k, args.gemv_n, args.gemv_m
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], (m, kdim), jnp.bfloat16)
    w = jax.random.normal(ks[1], (n, kdim), jnp.float32)
    packed, scale = gemv.pack_weights_per_channel(w, bits=args.gemv_bits)
    best = None
    errored = False
    for bn in args.block_n:
        fn = jax.jit(
            lambda x, p, sc, _bn=bn: gemv.wq_matmul_per_channel(
                x, p, sc, bits=args.gemv_bits, block_n=_bn
            )
        )
        try:
            jax.block_until_ready(fn(x, packed, scale))
        except Exception as e:
            errored |= _poisoned(e)
            print(json.dumps({"block_n": bn, "error": str(e)[:120]}), flush=True)
            continue
        t = measure_op_time(fn, (x, packed, scale), r1=60, r2=180, samples=8)
        row = {"block_n": bn, "us": round(t * 1e6, 1)}
        print(json.dumps(row), flush=True)
        if best is None or row["us"] < best["us"]:
            best = row
    print(json.dumps({"best": best, "space": "gemv", "bits": args.gemv_bits,
                      "n": n, "k": kdim}), flush=True)
    if args.save and best is not None and errored and not args.save_despite_errors:
        print(json.dumps({"not_saved": "remote-compile failure poisoned "
                          "this process's timings; re-measure in a fresh "
                          "process or pass --save-despite-errors"}), flush=True)
        return
    if args.save and best is not None:
        path = tuning.record(
            f"gemv_w{args.gemv_bits}", kdim, tuning.pow2_bucket(n), False,
            0, best["block_n"], extra={"us": best["us"]},
        )
        print(json.dumps({"saved": path}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--space", default="k", choices=["k", "q", "bwd", "decode", "gemv"])
    # decode space: cache precision + GQA geometry
    p.add_argument("--kv-bits", default="8", choices=["16", "8", "4", "k4v8"],
                   help="[decode] cache precision")
    p.add_argument("--kv-heads", type=int, default=8, help="[decode] Hk")
    p.add_argument("--heads-per-step", type=int, nargs="+",
                   default=[1, 2, 4, 8], help="[decode] hb sweep values")
    # gemv space: weight matrix geometry (defaults = the llama-ish MLP shape)
    p.add_argument("--gemv-n", type=int, default=11008)
    p.add_argument("--gemv-k", type=int, default=4096)
    p.add_argument("--gemv-m", type=int, default=8)
    p.add_argument("--gemv-bits", type=int, default=8, choices=[8, 4])
    p.add_argument("--block_n", type=int, nargs="+",
                   default=[256, 512, 1024, 2048])
    p.add_argument("--decode-block-kv", type=int, nargs="+", default=None,
                   help="[decode] block_kv sweep values "
                        "(default: 1024 2048 4096 8192)")
    p.add_argument("--causal", action="store_true")
    p.add_argument("--block_q", type=int, nargs="+",
                   default=[512, 1024, 2048, 4096])
    p.add_argument("--block_kv", type=int, nargs="+",
                   default=[256, 512, 1024])
    p.add_argument("--save", action="store_true",
                   help="persist the winner to the tuning cache "
                        "(utils/tuning.py); the API then uses it whenever "
                        "block_q/block_kv are left unset for this shape")
    p.add_argument("--save-despite-errors", action="store_true",
                   help="allow --save even when a config hit a remote-"
                        "compile failure: an HTTP-500 poisons the REST of "
                        "the process's timings 20-70%% slow, so winners "
                        "measured after one are unreliable (two r4 sweep "
                        "winners were rejected by fresh-process rechecks); "
                        "default is to refuse and ask for a fresh-process "
                        "re-measure of the top candidates")
    args = p.parse_args()

    b, h, s, d = args.batch, args.heads, args.seq, args.head_dim

    if args.space == "decode":
        return tune_decode(args)
    if args.space == "gemv":
        return tune_gemv(args)

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    flops = attention_flops(b, h, d, s, s, args.causal)

    if args.space == "bwd":
        # Backward kernels (dq + dkv): sweep over fixed fwd residuals.
        from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
        from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import _flash_bwd

        o, lse2 = jax.jit(
            lambda q, k, v: flash_attention_fp(
                q, k, v, is_causal=args.causal, return_lse=True
            )
        )(q, k, v)
        do = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.bfloat16)
        fargs = (q, k, v, jax.block_until_ready(o), lse2, do)

        def kernel(q, k, v, o, l, g, is_causal, block_q, block_kv):
            return _flash_bwd(q, k, v, o, l, g, is_causal=is_causal,
                              sm_scale=1.0 / d ** 0.5,
                              block_q=block_q, block_kv=block_kv)

        flops = int(flops * 2.5)  # dq/dk/dv: 5 block matmuls vs fwd's 2
    elif args.space == "k":
        qc, qs = q_ops.quant_int8(q, gran="per_token", layout="ds")
        kc, ksc = q_ops.quant_int8(k, gran="per_token")
        fargs = (qc, kc, jnp.swapaxes(v, 2, 3), qs, ksc)
        kernel = lowbit_attention_km
    else:
        qc, qs = q_ops.quant_int8(q, gran="per_token")
        kc, ksc = q_ops.quant_int8(k, gran="per_token")
        fargs = (qc, kc, v, qs, ksc)
        kernel = lowbit_attention

    best = None
    errored = False
    for bq in args.block_q:
        for bkv in args.block_kv:
            if bq > s or bkv > s:
                continue
            fn = jax.jit(
                lambda *xs, _bq=bq, _bkv=bkv: kernel(
                    *xs, is_causal=args.causal,
                    block_q=_bq, block_kv=_bkv,
                )
            )
            try:
                jax.block_until_ready(fn(*fargs))
            except Exception as e:  # Mosaic rejection (VMEM, block rules)
                errored |= _poisoned(e)
                print(json.dumps({"block_q": bq, "block_kv": bkv,
                                  "error": str(e)[:120]}), flush=True)
                continue
            t = measure_op_time(fn, fargs)
            row = {"block_q": bq, "block_kv": bkv,
                   "tflops": round(tflops(flops, t), 2),
                   "ms": round(t * 1e3, 3)}
            print(json.dumps(row), flush=True)
            if best is None or row["tflops"] > best["tflops"]:
                best = row
    print(json.dumps({"best": best, "space": args.space, "seq": s,
                      "causal": args.causal}), flush=True)
    if args.save and best is not None and errored and not args.save_despite_errors:
        print(json.dumps({"not_saved": "a config hit a remote-compile "
                          "failure; timings after it are poisoned — "
                          "re-measure the winner in a fresh process or "
                          "pass --save-despite-errors"}), flush=True)
        return
    if args.save and best is not None:
        from lowbit_quant_fa2_paddle_tpu.utils import tuning

        name = {"k": "km", "q": "q", "bwd": "bwd"}[args.space]
        path = tuning.record(
            name, d, s, args.causal,
            best["block_q"], best["block_kv"], best["tflops"],
        )
        print(json.dumps({"saved": path}), flush=True)


if __name__ == "__main__":
    main()
