"""INT2, attention bias, logit cap, and bitmap mixed-precision variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.core import (
    lowbit_fa_mixed_bits,
    lowbit_fa_qk_int2_pv_fp16,
    quantize_with_bitmap,
)
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _qkv(key=0, b=1, h=4, s=256, d=64):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(kk, (b, h, s, d)) for kk in ks)


def test_int2_quant_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 128, 64))
    packed, scale = q_ops.quant_int2(x, gran="per_token")
    assert packed.shape == (1, 2, 128, 16)
    codes = q_ops.unpack_int2(packed)
    assert int(jnp.max(codes)) <= 1 and int(jnp.min(codes)) >= -1
    x_dq = codes.astype(jnp.float32) * scale[..., None]
    # Lloyd-Max 3-level quantizer of gaussian data: element cos ~0.90
    assert float(metrics.cosine_similarity(x_dq, x)) > 0.88


@pytest.mark.parametrize("causal", [False, True])
def test_int2_attention_api(causal):
    q, k, v = _qkv(1)
    o = lowbit_fa_qk_int2_pv_fp16(q, k, v, is_causal=causal)
    o_ref = attention_reference(q, k, v, is_causal=causal)
    # int2 K: loose threshold, but output must be strongly correlated
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.9


def test_int2_codes_on_three_level_grid():
    """Dequantized int2 values live exactly on {-s, 0, +s} per token."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 128, 64))
    packed, scale = q_ops.quant_int2(x, gran="per_token")
    codes = q_ops.unpack_int2(packed)
    vals = np.unique(np.asarray(codes))
    assert set(vals.tolist()) <= {-1, 0, 1}


@pytest.mark.parametrize("vector", [True, False])
def test_attention_bias(vector):
    b, h, s, d = 1, 2, 256, 64
    q, k, v = _qkv(3, b=b, h=h, s=s, d=d)
    kb = jax.random.PRNGKey(30)
    bias = (
        jax.random.normal(kb, (b, h, 1, s))
        if vector
        else jax.random.normal(kb, (b, h, s, s))
    )
    q_codes, q_scale = q_ops.quant_int8(q, gran="per_token")
    k_codes, k_scale = q_ops.quant_int8(k, gran="per_token")
    o = lowbit_attention(
        q_codes, k_codes, v, q_scale, k_scale, bias=bias,
        pv_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    # oracle: add bias to logits
    import math
    sm = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm + bias
    p = jax.nn.softmax(logits, axis=-1)
    o_ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


def test_logit_cap():
    q, k, v = _qkv(4)
    q = q * 4  # big logits so capping matters
    q_codes, q_scale = q_ops.quant_int8(q, gran="per_token")
    k_codes, k_scale = q_ops.quant_int8(k, gran="per_token")
    o = lowbit_attention(
        q_codes, k_codes, v, q_scale, k_scale, logit_cap=5.0,
        pv_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    o_ref = attention_reference(q, k, v, logit_cap=5.0)
    o_nocap = attention_reference(q, k, v)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999
    assert float(metrics.cosine_similarity(o, o_nocap)) < 0.999  # cap changed things


def test_bitmap_mixed_precision():
    q, k, v = _qkv(5, s=512)
    nblk = 4
    all8 = jnp.ones((nblk,), jnp.int32)
    none8 = jnp.zeros((nblk,), jnp.int32)
    o_ref = attention_reference(q, k, v)
    o_all8 = lowbit_fa_mixed_bits(q, k, v, all8)
    o_none8 = lowbit_fa_mixed_bits(q, k, v, none8)
    cos8 = float(metrics.cosine_similarity(o_all8, o_ref))
    cos4 = float(metrics.cosine_similarity(o_none8, o_ref))
    assert cos8 > 0.999
    assert cos8 > cos4  # more int8 blocks -> better accuracy
    # bitmap=all-ones must equal the plain int8 path
    o_plain = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v)
    np.testing.assert_allclose(
        np.asarray(o_all8, np.float32), np.asarray(o_plain, np.float32), atol=1e-5
    )


def test_bits_dispatch_int2():
    q, k, v = _qkv(6)
    o = lq.lowbit_fa_attn(q, k, v, bits="int2")
    assert o.shape == q.shape
