"""Oracle self-tests: the fp32 reference must match first principles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import (
    attention_reference,
    dequant_group_asym_ref,
    dequant_symmetric_ref,
    quant_group_asym_ref,
    quant_symmetric_ref,
    smooth_k_reference,
    lse_smooth_k_correction,
)


def _rand_qkv(key, b=2, h=4, s=64, d=32, h_kv=None, dtype=jnp.float32):
    h_kv = h_kv or h
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h_kv, s, d), dtype)
    v = jax.random.normal(kv, (b, h_kv, s, d), dtype)
    return q, k, v


def _naive(q, k, v, causal=False, scale=None):
    scale = scale or 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float64), np.asarray(k, np.float64)) * scale
    if causal:
        sq, sk = logits.shape[-2:]
        m = np.tril(np.ones((sq, sk), bool))
        logits = np.where(m, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v, np.float64))


@pytest.mark.parametrize("causal", [False, True])
def test_attention_reference_matches_numpy(causal):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    o = attention_reference(q, k, v, is_causal=causal)
    np.testing.assert_allclose(np.asarray(o), _naive(q, k, v, causal), rtol=1e-5, atol=1e-5)


def test_attention_reference_gqa():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), h=8, h_kv=2)
    o = attention_reference(q, k, v)
    k_rep = jnp.repeat(k, 4, axis=1)
    v_rep = jnp.repeat(v, 4, axis=1)
    o_rep = attention_reference(q, k_rep, v_rep)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_rep), rtol=1e-6)


def test_attention_reference_lse():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2))
    o, lse = attention_reference(q, k, v, return_lse=True)
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q, np.float64), np.asarray(k, np.float64)) * scale
    expected = np.log(np.exp(logits).sum(-1))
    np.testing.assert_allclose(np.asarray(lse), expected, rtol=1e-4, atol=1e-5)


def test_segment_mask_blocks_cross_attention():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, s=8)
    seg = jnp.array([[0, 0, 0, 0, 1, 1, 1, 1]])
    o = attention_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg)
    # First segment must equal standalone attention over its 4 tokens.
    o_sub = attention_reference(q[:, :, :4], k[:, :, :4], v[:, :, :4],
                                sm_scale=1.0 / np.sqrt(q.shape[-1]))
    np.testing.assert_allclose(np.asarray(o[:, :, :4]), np.asarray(o_sub), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("block", [0, 1, 32])
@pytest.mark.parametrize("bits", [8, 4])
def test_quant_symmetric_roundtrip(block, bits):
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 64, 32))
    codes, scale = quant_symmetric_ref(x, bits=bits, block=block)
    x_dq = dequant_symmetric_ref(codes, scale, block=block)
    # Max roundtrip error is half a quantization step.
    qmax = 2 ** (bits - 1) - 1
    if block == 0:
        step = np.asarray(scale)[:, :, :, None]  # [B,H,1] -> [B,H,1,1]
    else:
        step = np.repeat(np.asarray(scale), block, axis=2)[:, :, :64, None]
    err = np.abs(np.asarray(x_dq) - np.asarray(x))
    assert (err <= step * 0.5 + 1e-6).all()
    assert float(metrics.cosine_similarity(x_dq, x)) > (0.999 if bits == 8 else 0.99)


@pytest.mark.parametrize("bits", [8, 4, 2])
def test_quant_group_asym_roundtrip(bits):
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 64)) * 3 + 1
    codes, scale, mn = quant_group_asym_ref(x, bits=bits, group=32)
    x_dq = dequant_group_asym_ref(codes, scale, mn, group=32)
    err = np.abs(np.asarray(x_dq) - np.asarray(x))
    step = np.repeat(np.asarray(scale), 32, axis=-1)
    assert (err <= step * 0.5 + 1e-5).all()
    assert not np.isnan(np.asarray(x_dq)).any()


def test_smooth_k_invariance():
    """Attention output is invariant to K smoothing; LSE shifts by the
    correction term (reference src/core.py:344-350)."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(6))
    k = k + 5.0  # strong shared offset
    scale = 1.0 / np.sqrt(q.shape[-1])
    o_base, lse_base = attention_reference(q, k, v, return_lse=True)
    ks, km = smooth_k_reference(k)
    o_s, lse_s = attention_reference(q, ks, v, return_lse=True)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_base), rtol=1e-4, atol=1e-5)
    lse_fixed = lse_smooth_k_correction(lse_s, q, km, scale)
    np.testing.assert_allclose(np.asarray(lse_fixed), np.asarray(lse_base), rtol=1e-4, atol=1e-4)


def test_chunked_oracle_matches_naive():
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), h=4, h_kv=2, s=300)
    from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference_chunked

    for causal in (False, True):
        a = attention_reference(q, k, v, is_causal=causal)
        b = attention_reference_chunked(q, k, v, is_causal=causal, chunk=128)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
