"""Seeded cross-flag fuzz: random combinations of every kernel flag.

Targeted tests cover each flag in isolation; this sweep samples the
interaction space (causal x segments x bias x logit_cap x K bits x int8-V x
smooth-V x fused-Q x shapes) with a fixed seed per case, asserting

  1. the K-major and Q-major schedules agree on identical codes (same math,
     transposed dataflow — accumulation-order noise only), and
  2. both track the exact fp32 oracle (when the combo is oracle-expressible;
     the oracle has no bias term).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    lowbit_attention,
    lowbit_attention_km,
)
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_v_int8_per_channel
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _sample(seed):
    r = random.Random(seed)
    h = r.choice([2, 4])
    return dict(
        b=r.choice([1, 2]),
        h=h,
        hk=r.choice([g for g in (1, 2, h) if h % g == 0]),
        sq=r.choice([96, 130, 257]),
        sk=r.choice([128, 200, 300]),
        d=r.choice([64, 64, 128]),
        causal=r.random() < 0.5,
        k_bits=r.choice([8, 8, 4]),
        v_int8=r.random() < 0.4,
        smooth_v=r.random() < 0.5,
        segments=r.random() < 0.4,
        bias=r.choice([None, None, "vec", "mat"]),
        logit_cap=r.choice([0.0, 0.0, 25.0]),
        fused_q=r.random() < 0.3,
        # round-2 flags: per-schedule mask-split and true int8 P@V
        mask_split_q=r.random() < 0.5,
        mask_split_k=r.random() < 0.5,
        pv_int8=r.random() < 0.3,
        # round-3 flags: sliding window (+ sink anchors), causal-only
        window=r.choice([0, 0, 37, 100]),
        sink=r.choice([0, 0, 40]),
    )


@pytest.mark.parametrize("seed", range(20))
def test_flag_combination(seed):
    c = _sample(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (c["b"], c["h"], c["sq"], c["d"]), jnp.float32)
    k = jax.random.normal(ks[1], (c["b"], c["hk"], c["sk"], c["d"]), jnp.float32)
    v = jax.random.normal(ks[2], (c["b"], c["hk"], c["sk"], c["d"]), jnp.float32)

    kw_q, kw_k = {}, {}  # per-space kwargs
    if c["k_bits"] == 4:
        kc, ksc = q_ops.quant_int4(k)
        kw_q["k_packed_int4"] = kw_k["k_packed_int4"] = True
    else:
        kc, ksc = q_ops.quant_int8(k, gran="per_token")

    v_in, vT_in = v, jnp.swapaxes(v, 2, 3)
    if c["v_int8"]:
        if c["smooth_v"]:
            vc, vsc, vm = quant_v_int8_per_channel(v, smooth_v=True)
            kw_q["v_mean"] = kw_k["v_mean"] = vm
        else:
            vc, vsc, _ = quant_v_int8_per_channel(v)
        kw_q["v_scale"] = kw_k["v_scale"] = vsc
        v_in, vT_in = vc, jnp.swapaxes(vc, 2, 3)

    if c["segments"]:
        qseg = (jnp.arange(c["sq"])[None] // 70).astype(jnp.int32).repeat(c["b"], 0)
        kseg = (jnp.arange(c["sk"])[None] // 90).astype(jnp.int32).repeat(c["b"], 0)
        for kw in (kw_q, kw_k):
            kw["q_segment_ids"] = qseg
            kw["kv_segment_ids"] = kseg
    if c["bias"] == "vec":
        bias = 0.2 * jax.random.normal(ks[3], (c["b"], c["h"], 1, c["sk"]), jnp.float32)
        kw_q["bias"] = kw_k["bias"] = bias
    elif c["bias"] == "mat":
        bias = 0.2 * jax.random.normal(ks[3], (c["b"], c["h"], c["sq"], c["sk"]), jnp.float32)
        kw_q["bias"] = kw_k["bias"] = bias
    kw_q["logit_cap"] = kw_k["logit_cap"] = c["logit_cap"]
    kw_q["is_causal"] = kw_k["is_causal"] = c["causal"]
    if c["causal"] and c["window"]:
        kw_q["window_size"] = kw_k["window_size"] = c["window"]
        kw_q["sink_size"] = kw_k["sink_size"] = c["sink"]
    kw_q["mask_split"] = c["mask_split_q"]
    kw_k["mask_split"] = c["mask_split_k"]
    if c["v_int8"] and c["pv_int8"]:
        kw_q["pv_int8"] = kw_k["pv_int8"] = True

    if c["fused_q"]:
        o = lowbit_attention(q, kc, v_in, k_scale=ksc, fused_quant_q=True,
                             block_q=128, block_kv=128, **kw_q)
        oT = lowbit_attention_km(q, kc, vT_in, k_scale=ksc, fused_quant_q=True,
                                 block_q=256, block_kv=128, **kw_k)
    else:
        qc, qs = q_ops.quant_int8(q, gran="per_token")
        qTc, qTs = q_ops.quant_int8(q, gran="per_token", layout="ds")
        o = lowbit_attention(qc, kc, v_in, qs, ksc,
                             block_q=128, block_kv=128, **kw_q)
        oT = lowbit_attention_km(qTc, kc, vT_in, qTs, ksc,
                                 block_q=256, block_kv=128, **kw_k)

    cos_spaces = float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3)))
    assert cos_spaces > 0.9999, (c, cos_spaces)

    if c["bias"] is None:
        o_ref = attention_reference(
            q, k, v, is_causal=c["causal"],
            window_size=kw_q.get("window_size"),
            sink_size=kw_q.get("sink_size", 0),
            q_segment_ids=kw_q.get("q_segment_ids"),
            kv_segment_ids=kw_q.get("kv_segment_ids"),
            logit_cap=c["logit_cap"] or None,
        )
        # causal x segments can leave q rows with ZERO valid keys; the
        # kernels output 0 there while the naive oracle emits the mean of V
        # (softmax of an all-masked row is uniform). Exclude those rows.
        valid = jnp.ones((c["b"], 1, c["sq"], 1), bool)
        if c["causal"] or c["segments"] or kw_q.get("window_size"):
            qi = jnp.arange(c["sq"])[None, :, None]
            ki = jnp.arange(c["sk"])[None, None, :]
            m = jnp.ones((c["b"], c["sq"], c["sk"]), bool)
            if c["causal"]:
                m = m & (ki <= qi)
                if kw_q.get("window_size"):
                    inw = ki + kw_q["window_size"] > qi
                    if kw_q.get("sink_size"):
                        inw = inw | (ki < kw_q["sink_size"])
                    m = m & inw
            if c["segments"]:
                m = m & (kw_q["q_segment_ids"][:, :, None]
                         == kw_q["kv_segment_ids"][:, None, :])
            valid = jnp.any(m, axis=-1)[:, None, :, None]
        tol = 0.999 if c["k_bits"] == 8 else 0.97
        if c["v_int8"]:
            tol = min(tol, 0.998)
        if c["v_int8"] and c["pv_int8"]:
            tol = min(tol, 0.995)  # 8-bit softmax weights
        cos_ref = float(cosine_similarity(
            jnp.where(valid, o, 0), jnp.where(valid, o_ref, 0)))
        assert cos_ref > tol, (c, cos_ref)
