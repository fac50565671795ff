"""On-chip record for the round-3 attention modes: sliding window, sinks,
and the multi-token (speculative-verify) decode.

Prints one JSON line per row and writes WINDOW_TPU.json at the repo root.

  python bench/window_bench.py            # real TPU
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time


def prefill_rows(rows):
    b, h, s, d = 4, 32, 32768, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    variants = {
        "causal_full": {},
        "window4096": {"window_size": 4096},
        "window1024": {"window_size": 1024},
        "window1024_sink128": {"window_size": 1024, "sink_size": 128},
    }
    fns = {
        name: jax.jit(
            lambda q, k, v, _kw=kw: lq.lowbit_fa_qk_int8_pv_fp16(
                q, k, v, is_causal=True, **_kw
            )
        )
        for name, kw in variants.items()
    }
    for f in fns.values():
        jax.block_until_ready(f(q, k, v))
    base = None
    for name, f in fns.items():
        t = measure_op_time(f, (q, k, v))
        base = base or t
        row = {
            "bench": "prefill_int8_b4h32s32768d64",
            "variant": name,
            "ms": round(t * 1e3, 2),
            "vs_full_causal": round(base / t, 2),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)


def decode_rows(rows):
    b, h, hk, s, d = 1, 32, 8, 131072, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q1 = jax.random.normal(ks[0], (b, h, d))
    q4 = jax.random.normal(ks[0], (b, 4, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.asarray([s], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    variants = {
        "full_1tok": (q1, {}),
        # compacted banded walk (default) vs the r3 dead-step walk —
        # same outputs (asserted below), only the grid differs
        "window8k_1tok": (q1, {"window_size": 8192}),
        "window8k_deadsteps_1tok": (
            q1, {"window_size": 8192, "compact_window": False}),
        "window8k_sink128_1tok": (q1, {"window_size": 8192, "sink_size": 128}),
        "full_verify4": (q4, {}),
    }
    fns = {
        name: (
            jax.jit(
                lambda q, kc, vc, ksc, vsc, l, _kw=kw: dec.decode_attention(
                    q, kc, vc, ksc, l, v_scale=vsc, **_kw
                )
            ),
            qq,
        )
        for name, (qq, kw) in variants.items()
    }
    outs = {}
    for name, (f, qq) in fns.items():
        outs[name] = jax.block_until_ready(f(qq, kc, vc, ksc, vsc, lengths))
    import numpy as np
    np.testing.assert_array_equal(
        np.asarray(outs["window8k_1tok"]),
        np.asarray(outs["window8k_deadsteps_1tok"]),
    )  # compaction changes the walk, never the math
    # Interleaved min-of-rounds: single measure_op_time calls on sub-0.2 ms
    # kernels flap bimodally on this transport even at 60/180/8 (observed
    # 76 vs 176 us for the same jitted fn minutes apart); three rounds
    # visiting every variant in turn, min per variant, is the estimator
    # that has agreed across processes.
    times = {name: float("inf") for name in fns}
    for _ in range(3):
        for name, (f, qq) in fns.items():
            t = measure_op_time(
                f, (qq, kc, vc, ksc, vsc, lengths), r1=60, r2=180, samples=8
            )
            times[name] = min(times[name], t)
    base = None
    for name in fns:
        t = times[name]
        base = base or t
        row = {
            "bench": "decode_int8_128K_b1h32hk8d128",
            "variant": name,
            "ms_per_step": round(t * 1e3, 3),
            "vs_full_1tok": round(base / t, 2),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)


def main():
    rows = []
    prefill_rows(rows)
    decode_rows(rows)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "WINDOW_TPU.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0].device_kind), "rows": rows}, f,
                  indent=1)
    print(json.dumps({"saved": out}), flush=True)


if __name__ == "__main__":
    main()
