"""K-major (transposed-space) attention kernel vs the Q-major reference path.

The K-major schedule (ops/attention.lowbit_attention_km) must be numerically
interchangeable with the Q-major kernel across every feature flag — same
online-softmax math on transposed tiles (see _attn_body_km docstring for the
schedule rationale). Tolerances are loose only for accumulation-order noise.
"""

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

B, H, HK, S, SK, D = 2, 4, 2, 300, 520, 64


@pytest.fixture(scope="module")
def data():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, HK, SK, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, HK, SK, D), jnp.float32)
    qc, qs = q_ops.quant_int8(q, gran="per_token")
    qTc, qTs = q_ops.quant_int8(q, gran="per_token", layout="ds")
    kc, ksc = q_ops.quant_int8(k, gran="per_token")
    return dict(q=q, k=k, v=v, qc=qc, qs=qs, qTc=qTc, qTs=qTs, kc=kc, ksc=ksc,
                vT=jnp.swapaxes(v, 2, 3))


def _q_major(d, **kw):
    return lowbit_attention(d["qc"], d["kc"], d["v"], d["qs"], d["ksc"],
                            block_q=128, block_kv=128, **kw)


def _k_major(d, **kw):
    return lowbit_attention_km(d["qTc"], d["kc"], d["vT"], d["qTs"], d["ksc"],
                               block_q=256, block_kv=128, **kw)


@pytest.mark.parametrize("causal", [False, True])
def test_matches_q_major(data, causal):
    o = _q_major(data, is_causal=causal)
    oT = _k_major(data, is_causal=causal)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.9999


@pytest.mark.parametrize("causal", [False, True])
def test_lse_matches(data, causal):
    _, lse_ref = _q_major(data, is_causal=causal, return_lse=True)
    _, lse = _k_major(data, is_causal=causal, return_lse=True)
    assert lse.shape == (B, H, S)
    assert float(jnp.max(jnp.abs(lse - lse_ref))) < 1e-2


def test_int4_packed_k(data):
    kc4, ks4 = q_ops.quant_int4(data["k"])
    o = lowbit_attention(data["qc"], kc4, data["v"], data["qs"], ks4,
                         k_packed_int4=True, block_q=128, block_kv=128)
    oT = lowbit_attention_km(data["qTc"], kc4, data["vT"], data["qTs"], ks4,
                             k_packed_int4=True, block_q=256, block_kv=128)
    # Same codes, same dequant math -> bit-equal up to accumulation order.
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.99999


def test_quantized_v_smooth_v(data):
    vc, vsc, vm = quant_v_int8_per_channel(data["v"], smooth_v=True)
    o = lowbit_attention(data["qc"], data["kc"], vc, data["qs"], data["ksc"],
                         v_scale=vsc, v_mean=vm, block_q=128, block_kv=128)
    oT = lowbit_attention_km(data["qTc"], data["kc"], jnp.swapaxes(vc, 2, 3),
                             data["qTs"], data["ksc"], v_scale=vsc, v_mean=vm,
                             block_q=256, block_kv=128)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.9999


def test_segments(data):
    qseg = (jnp.arange(S)[None, :] // 150).astype(jnp.int32).repeat(B, 0)
    kseg = (jnp.arange(SK)[None, :] // 260).astype(jnp.int32).repeat(B, 0)
    o = _q_major(data, q_segment_ids=qseg, kv_segment_ids=kseg)
    oT = _k_major(data, q_segment_ids=qseg, kv_segment_ids=kseg)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.9999


def test_bias_and_logit_cap(data):
    bias = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (B, H, S, SK), jnp.float32)
    o = _q_major(data, bias=bias, logit_cap=30.0)
    oT = _k_major(data, bias=bias, logit_cap=30.0)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.99999


def test_per_key_bias_vector(data):
    bias = 0.2 * jax.random.normal(jax.random.PRNGKey(9), (B, H, 1, SK), jnp.float32)
    o = _q_major(data, bias=bias)
    oT = _k_major(data, bias=bias)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.99999


def test_float_path(data):
    q16 = data["q"].astype(jnp.bfloat16)
    k16 = data["k"].astype(jnp.bfloat16)
    v16 = data["v"].astype(jnp.bfloat16)
    o = lowbit_attention(q16, k16, v16, block_q=128, block_kv=128)
    oT = lowbit_attention_km(jnp.swapaxes(q16, 2, 3), k16,
                             jnp.swapaxes(v16, 2, 3), block_q=256, block_kv=128)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.9999


def test_single_block_small_seq():
    # Shapes below one block: partial edge blocks on both axes.
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (1, 2, 70, D), jnp.float32)
    k = jax.random.normal(ks[1], (1, 2, 90, D), jnp.float32)
    v = jax.random.normal(ks[2], (1, 2, 90, D), jnp.float32)
    qTc, qTs = q_ops.quant_int8(q, gran="per_token", layout="ds")
    kc, ksc = q_ops.quant_int8(k, gran="per_token")
    qc, qs = q_ops.quant_int8(q, gran="per_token")
    o = lowbit_attention(qc, kc, v, qs, ksc, block_q=128, block_kv=128)
    oT = lowbit_attention_km(qTc, kc, jnp.swapaxes(v, 2, 3), qTs, ksc,
                             block_q=128, block_kv=128)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.9999


def test_v_natural_matches_v_transposed(data):
    # v_natural consumes the natural [BK, D] tile via dot dimension numbers
    # (no V^T pass); same math, different MXU feed layout -> agree to
    # operand-precision ulp.
    oT = _k_major(data)
    oN = lowbit_attention_km(data["qTc"], data["kc"], data["v"], data["qTs"],
                             data["ksc"], v_natural=True, block_q=256, block_kv=128)
    assert float(cosine_similarity(oT, oN)) > 0.99999


@pytest.mark.parametrize("causal", [False, True])
def test_hd128_gqa(causal):
    # hd128 at the kernel level (the public-API grid covers hd128 only via
    # the wrapper): K-major vs Q-major with GQA and ragged seqs, plus the
    # fused-Q variant, ahead of the hd128 hardware autotune.
    b, h, hk, sq, sk, d = 1, 4, 2, 260, 390, 128
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hk, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hk, sk, d), jnp.float32)
    qc, qs = q_ops.quant_int8(q, gran="per_token")
    qTc, qTs = q_ops.quant_int8(q, gran="per_token", layout="ds")
    kc, ksc = q_ops.quant_int8(k, gran="per_token")
    o = lowbit_attention(qc, kc, v, qs, ksc, is_causal=causal,
                         block_q=128, block_kv=128)
    oT = lowbit_attention_km(qTc, kc, jnp.swapaxes(v, 2, 3), qTs, ksc,
                             is_causal=causal, block_q=256, block_kv=128)
    assert float(cosine_similarity(o, jnp.swapaxes(oT, 2, 3))) > 0.9999
    oF = lowbit_attention_km(q, kc, jnp.swapaxes(v, 2, 3), k_scale=ksc,
                             fused_quant_q=True, is_causal=causal,
                             block_q=256, block_kv=128)
    assert float(cosine_similarity(oT, oF)) > 0.99999
