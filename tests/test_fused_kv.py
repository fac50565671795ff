"""Fully-fused packed-KV (KIVI-style) attention tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import fused_kv
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _qkv(key=0, b=1, h=4, hk=None, s=512, d=64):
    hk = hk or h
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, hk, s, d)) + 0.5  # offset: zero-points matter
    v = jax.random.normal(ks[2], (b, hk, s, d)) - 0.3
    return q, k, v


@pytest.mark.parametrize("bits", [4, 2])
def test_quant_kv_grouped_roundtrip(bits):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 512, 64)) + 1.0
    packed, scale, mn = fused_kv.quant_kv_grouped(x, bits=bits, group=256)
    assert packed.shape == (1, 2, 512, 64 * bits // 8)
    codes = fused_kv._unpack_unsigned(packed, bits)
    xg = codes.astype(jnp.float32).reshape(1, 2, 2, 256, 64)
    x_dq = (xg * scale[:, :, :, None] + mn[:, :, :, None]).reshape(1, 2, 512, 64)
    assert float(metrics.cosine_similarity(x_dq, x)) > (0.995 if bits == 4 else 0.93)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_kv_attention_int4(causal):
    q, k, v = _qkv(1)
    kp, ks, km = fused_kv.quant_kv_grouped(k, bits=4, group=256)
    vp, vs, vm = fused_kv.quant_kv_grouped(v, bits=4, group=256)
    o = fused_kv.fused_packed_kv_attention(
        q, kp, vp, ks, km, vs, vm, bits=4, is_causal=causal, out_dtype=jnp.float32
    )
    o_ref = attention_reference(q, k, v, is_causal=causal)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.99


def test_fused_kv_attention_int2():
    q, k, v = _qkv(2)
    kp, ks, km = fused_kv.quant_kv_grouped(k, bits=2, group=256)
    vp, vs, vm = fused_kv.quant_kv_grouped(v, bits=2, group=256)
    o = fused_kv.fused_packed_kv_attention(
        q, kp, vp, ks, km, vs, vm, bits=2, out_dtype=jnp.float32
    )
    o_ref = attention_reference(q, k, v)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.9


def test_fused_kv_gqa_and_ragged():
    q, k, v = _qkv(3, h=8, hk=2, s=400)  # ragged seq (pads to 512)
    kp, ks, km = fused_kv.quant_kv_grouped(k, bits=4, group=256)
    vp, vs, vm = fused_kv.quant_kv_grouped(v, bits=4, group=256)
    o = fused_kv.fused_packed_kv_attention(
        q, kp, vp, ks, km, vs, vm, bits=4, out_dtype=jnp.float32
    )
    o_ref = attention_reference(q, k, v)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.99


def test_fused_kv_exact_on_grid_values():
    """K/V already on the 4-bit grid with known scale/mn -> kernel-exact."""
    b, h, s, d, group = 1, 2, 512, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (b, h, s, d))
    codes_k = jax.random.randint(ks[1], (b, h, s, d), 0, 16)
    codes_v = jax.random.randint(ks[2], (b, h, s, d), 0, 16)
    k = codes_k.astype(jnp.float32) * 0.1 - 0.8
    v = codes_v.astype(jnp.float32) * 0.05 - 0.4
    kp, ksc, km = fused_kv.quant_kv_grouped(k, bits=4, group=group)
    vp, vsc, vm = fused_kv.quant_kv_grouped(v, bits=4, group=group)
    o = fused_kv.fused_packed_kv_attention(
        q, kp, vp, ksc, km, vsc, vm, bits=4, out_dtype=jnp.float32
    )
    o_ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=5e-3, rtol=1e-2)


def test_k_major_schedule_matches_q_major():
    import jax
    import jax.numpy as jnp

    from lowbit_quant_fa2_paddle_tpu.ops.fused_kv import (
        fused_packed_kv_attention,
        quant_kv_grouped,
    )
    from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity

    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (2, 4, 300, 64), jnp.float32)
    k = jax.random.normal(ks[1], (2, 2, 520, 64), jnp.float32)
    v = jax.random.normal(ks[2], (2, 2, 520, 64), jnp.float32)
    for bits in (4, 2):
        kp, kss, kmn = quant_kv_grouped(k, bits=bits, group=256)
        vp, vs, vm = quant_kv_grouped(v, bits=bits, group=256)
        for causal in (False, True):
            oq = fused_packed_kv_attention(q, kp, vp, kss, kmn, vs, vm, bits=bits,
                                           is_causal=causal, group=256, kernel_space="q")
            ok = fused_packed_kv_attention(q, kp, vp, kss, kmn, vs, vm, bits=bits,
                                           is_causal=causal, group=256, kernel_space="k")
            assert float(cosine_similarity(oq, ok)) > 0.9999
