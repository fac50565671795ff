"""Public API surface tests (reference parity: src/core.py entry points)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.core import (
    lowbit_fa_qk_int8_pv_int8,
    manual_scaled_dot_product_attention,
    select_quantization,
)
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _qkv(key=0, b=2, h=4, s=256, d=64, layout="HND", dtype=jnp.float32, scale=1.0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    shape = (b, h, s, d) if layout == "HND" else (b, s, h, d)
    return tuple(jax.random.normal(kk, shape, dtype) * scale for kk in ks)


def _ref(q, k, v, layout="HND", **kw):
    if layout == "NHD":
        q, k, v = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    o = attention_reference(q, k, v, **kw)
    return jnp.swapaxes(o, 1, 2) if layout == "NHD" else o


@pytest.mark.parametrize("layout", ["HND", "NHD"])
@pytest.mark.parametrize("causal", [False, True])
def test_int8_api(layout, causal):
    q, k, v = _qkv(0, layout=layout)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, tensor_layout=layout, is_causal=causal)
    o_ref = _ref(q, k, v, layout=layout, is_causal=causal)
    assert o.shape == q.shape
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


@pytest.mark.parametrize("gran", ["per_block", "per_token", "per_thread", "per_warp"])
def test_int8_api_granularities(gran):
    q, k, v = _qkv(1)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, qk_quant_gran=gran)
    assert float(metrics.cosine_similarity(o, _ref(q, k, v))) > 0.999


def test_int8_api_smooth_k_handles_k_offset():
    q, k, v = _qkv(2)
    k = k + 4.0  # shared outlier direction
    o_s = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, smooth_k=True)
    o_n = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, smooth_k=False)
    o_ref = _ref(q, k, v)
    cos_s = float(metrics.cosine_similarity(o_s, o_ref))
    cos_n = float(metrics.cosine_similarity(o_n, o_ref))
    assert cos_s > 0.999
    assert cos_s > cos_n  # smoothing must help under K offset


def test_int8_api_lse():
    q, k, v = _qkv(3)
    k = k + 2.0
    o, lse = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, return_lse=True)
    _, lse_ref = attention_reference(q, k, v, return_lse=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=5e-2, rtol=1e-2)


def test_int8_pv_int8_api():
    q, k, v = _qkv(4)
    v = v + 1.0
    o = lowbit_fa_qk_int8_pv_int8(q, k, v)
    assert float(metrics.cosine_similarity(o, _ref(q, k, v))) > 0.999


@pytest.mark.parametrize("causal", [False, True])
def test_int4_api(causal):
    q, k, v = _qkv(5)
    o = lq.lowbit_fa_qk_int4_pv_fp16(q, k, v, is_causal=causal)
    assert float(metrics.cosine_similarity(o, _ref(q, k, v, is_causal=causal))) > 0.99


def test_head_dim_padding():
    q, k, v = _qkv(6, d=48)  # non-multiple-of-64 head dim
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v)
    assert o.shape == q.shape
    assert float(metrics.cosine_similarity(o, _ref(q, k, v))) > 0.999


def test_bf16_inputs():
    q, k, v = _qkv(7, dtype=jnp.bfloat16)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v)
    assert o.dtype == jnp.bfloat16
    assert float(metrics.cosine_similarity(o, _ref(q, k, v))) > 0.995


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_api(causal):
    """Packed ragged batch == per-sequence dense attention."""
    key = jax.random.PRNGKey(8)
    lens = [60, 100, 96]
    t = sum(lens)
    h, d = 4, 64
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (t, h, d))
    k = jax.random.normal(ks[1], (t, h, d))
    v = jax.random.normal(ks[2], (t, h, d))
    cu = jnp.array([0, 60, 160, 256], jnp.int32)
    o = lq.lowbit_fa_varlen(q, k, v, cu, cu, is_causal=causal)
    assert o.shape == q.shape
    # compare each sequence against dense attention
    for i in range(3):
        lo, hi = int(cu[i]), int(cu[i + 1])
        qs = jnp.swapaxes(q[lo:hi], 0, 1)[None]
        kk = jnp.swapaxes(k[lo:hi], 0, 1)[None]
        vv = jnp.swapaxes(v[lo:hi], 0, 1)[None]
        o_ref = attention_reference(qs, kk, vv, is_causal=causal)
        o_seq = jnp.swapaxes(o[lo:hi], 0, 1)[None]
        assert float(metrics.cosine_similarity(o_seq, o_ref)) > 0.999, f"seq {i}"


def test_multi_precision_selector():
    assert select_quantization(jnp.ones((1, 1, 8, 8)) * 100, jnp.ones((1, 1, 8, 8)) * 100) == "fp16"
    assert select_quantization(jnp.ones((1, 1, 8, 8)) * 10, jnp.ones((1, 1, 8, 8)) * 10) == "int8"
    assert select_quantization(jnp.ones((1, 1, 8, 8)) * 0.1, jnp.ones((1, 1, 8, 8)) * 0.1) == "int4"


@pytest.mark.parametrize("scale,expected_cos", [(30.0, 0.999), (2.0, 0.999), (0.05, 0.98)])
def test_multi_precision_api(scale, expected_cos):
    q, k, v = _qkv(9, scale=scale)
    v = v / scale  # keep V well-conditioned; selector looks at Q/K
    o = lq.lowbit_fa_multi_precision(q, k, v)
    assert float(metrics.cosine_similarity(o, _ref(q, k, v))) > expected_cos


def test_multi_precision_jit():
    from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_multi_precision_jit

    q, k, v = _qkv(20)
    f = jax.jit(lambda q, k, v: lowbit_fa_multi_precision_jit(q, k, v))
    # large-scale inputs -> fp branch; normal -> int8; tiny -> int4: all must
    # track the oracle on their own inputs
    for s in (30.0, 2.0, 0.01):
        o = f(q * s, k * s, v)
        cos = float(metrics.cosine_similarity(o, _ref(q * s, k * s, v)))
        assert cos > (0.98 if s == 0.01 else 0.999), (s, cos)


def test_sageattn_aliases():
    q, k, v = _qkv(10)
    for fn in (
        lq.sageattn,
        lq.sageattn_qk_int8_pv_fp16_triton,
        lq.sageattn_qk_int8_pv_fp16_cuda,
        lq.sageattn_qk_int8_pv_fp8_cuda,
        lq.sageattn_qk_int4_pv_fp16_triton,
    ):
        o = fn(q, k, v)
        assert float(metrics.cosine_similarity(o, _ref(q, k, v))) > 0.99


def test_manual_sdpa():
    q, k, v = _qkv(11)
    o = manual_scaled_dot_product_attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(_ref(q, k, v, is_causal=True)), atol=1e-5
    )


def test_int8_api_jit_end_to_end():
    q, k, v = _qkv(12)
    f = jax.jit(lambda q, k, v: lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=True))
    o = f(q, k, v)
    assert float(metrics.cosine_similarity(o, _ref(q, k, v, is_causal=True))) > 0.999
