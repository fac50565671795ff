"""Training-path record: FA-2 backward kernels (ops/attention_bwd.py) driven
on the real chip — Mosaic-compile validation, gradient accuracy vs the
materialized fp32 oracle, and fwd / fwd+bwd wall times.

The reference is inference-only (SURVEY §4: no backward anywhere); this
benchmarks the beyond-parity training path: ``flash_attention_trainable``
(fp) and ``lowbit_attention_trainable`` (INT8 forward, straight-through
fp backward — QAT style).

FLOP convention: fwd = 4·B·H·D·S²(/2 causal); bwd adds 2.5x fwd (5 matmuls
vs 2), total 3.5x — the standard FA-2 accounting.

Usage: timeout 550 python bench/train_bench.py [--json TRAIN_TPU.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
    flash_attention_trainable,
    lowbit_attention_trainable,
)
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import (
    attention_flops,
    measure_op_time,
    tflops,
)


def _inputs(B, H, S, D, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), dtype)
    k = jax.random.normal(ks[1], (B, H, S, D), dtype)
    v = jax.random.normal(ks[2], (B, H, S, D), dtype)
    g = jax.random.normal(ks[3], (B, H, S, D), dtype)  # upstream cotangent
    return q, k, v, g


def _ref_grads(q, k, v, g, causal):
    """Materialized fp32 attention grads (oracle; small shapes only)."""

    def ref(q, k, v):
        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / (q.shape[-1] ** 0.5)
        if causal:
            qi = jnp.arange(s.shape[2])[:, None]
            ki = jnp.arange(s.shape[3])[None, :]
            s = jnp.where(ki <= qi, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        return jnp.sum(o * g.astype(jnp.float32))

    return jax.grad(ref, argnums=(0, 1, 2))(q, k, v)


def accuracy(causal):
    B, H, S, D = 2, 4, 1024, 64
    q, k, v, g = _inputs(B, H, S, D)
    r_dq, r_dk, r_dv = _ref_grads(q, k, v, g, causal)

    rows = {}
    for name, fn in (
        ("flash_fp", flash_attention_trainable),
        ("lowbit_int8", lowbit_attention_trainable),
        ("lowbit_int8_fpbwd", lambda q, k, v, c: lowbit_attention_trainable(
            q, k, v, c, None, None, None, False)),
    ):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v, causal) * g.astype(q.dtype))

        dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        cs = [
            float(cosine_similarity(a.astype(jnp.float32), b))
            for a, b in ((dq, r_dq), (dk, r_dk), (dv, r_dv))
        ]
        rows[name] = cs
        print(
            f"[train] grad accuracy {name} causal={causal}: "
            f"dq={cs[0]:.6f} dk={cs[1]:.6f} dv={cs[2]:.6f}",
            file=sys.stderr,
        )
    return rows


def timing(causal):
    B, H, S, D = 4, 16, 4096, 64
    q, k, v, g = _inputs(B, H, S, D)
    fwd_fl = attention_flops(B, H, D, S, S, causal=causal)
    out = {}
    for name, fn in (
        ("flash_fp", flash_attention_trainable),
        ("lowbit_int8", lowbit_attention_trainable),
        ("lowbit_int8_fpbwd", lambda q, k, v, c: lowbit_attention_trainable(
            q, k, v, c, None, None, None, False)),
    ):
        fwd = jax.jit(lambda q, k, v, fn=fn: fn(q, k, v, causal))
        jax.block_until_ready(fwd(q, k, v))
        t_f = measure_op_time(fwd, (q, k, v))

        def loss(q, k, v, fn=fn):
            return jnp.sum(fn(q, k, v, causal) * g.astype(q.dtype))

        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        jax.block_until_ready(vg(q, k, v))
        # Lighter rep counts: the chained fwd+bwd scan at r=24 is a large
        # remote-compile payload (observed HTTP body truncation at 24 reps);
        # at ~17 ms/call r=12 is far above the sub-ms noise regime anyway.
        t_b = measure_op_time(vg, (q, k, v), r1=4, r2=12, samples=4)
        out[name] = {
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_tflops": round(tflops(fwd_fl, t_f), 1),
            "fwd_bwd_ms": round(t_b * 1e3, 3),
            "fwd_bwd_tflops": round(tflops(3.5 * fwd_fl, t_b), 1),
        }
        print(
            f"[train] {name} causal={causal} b{B} h{H} s{S} d{D}: "
            f"fwd {t_f*1e3:.2f} ms ({out[name]['fwd_tflops']} TF) | "
            f"fwd+bwd {t_b*1e3:.2f} ms ({out[name]['fwd_bwd_tflops']} TF, 3.5x conv)",
            file=sys.stderr,
        )
    return {"shape": [B, H, S, D], **out}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    # One causal variant per process: the full matrix is ~16 chained-scan
    # remote compiles and overruns a 550 s budget; runs merge into the JSON.
    p.add_argument("--causal", type=int, choices=(0, 1), default=None)
    args = p.parse_args()
    rec = {"device": jax.devices()[0].device_kind}
    if args.json and os.path.exists(args.json):
        with open(args.json) as f:
            rec.update(json.load(f))
    variants = (False, True) if args.causal is None else (bool(args.causal),)
    for causal in variants:
        key = "causal" if causal else "noncausal"
        rec[key] = {"grad_cos_dq_dk_dv": accuracy(causal), "timing": timing(causal)}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[train] wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
