"""kernel_space routing on the public API wrappers.

Every dense wrapper (and varlen) defaults to the K-major kernel
(kernel_space="auto" == "k"); "q" keeps the Q-major kernel. Both spaces run
the same online-softmax math on the same quant codes, so outputs must agree
to accumulation-order noise, and both must track the exact fp32 oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _qkv(key=0, b=2, h=4, s=300, d=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(kk, (b, h, s, d), dtype) for kk in ks)


def _cos(a, b):
    return float(metrics.cosine_similarity(a, b))


WRAPPERS = {
    "int8": (lq.lowbit_fa_qk_int8_pv_fp16, 0.9999),
    "int8_v8": (lq.lowbit_fa_qk_int8_pv_int8, 0.9995),
    "int4": (lq.lowbit_fa_qk_int4_pv_fp16, 0.999),
}


@pytest.mark.parametrize("name", list(WRAPPERS))
@pytest.mark.parametrize("causal", [False, True])
def test_k_space_matches_q_space(name, causal):
    fn, tol = WRAPPERS[name]
    q, k, v = _qkv()
    ok = fn(q, k, v, is_causal=causal, kernel_space="k")
    oq = fn(q, k, v, is_causal=causal, kernel_space="q")
    assert ok.shape == oq.shape == q.shape
    assert _cos(ok, oq) > tol


@pytest.mark.parametrize("name", list(WRAPPERS))
def test_default_is_k_space_and_tracks_oracle(name):
    fn, _ = WRAPPERS[name]
    q, k, v = _qkv(key=1)
    o_auto = fn(q, k, v, is_causal=True)
    o_k = fn(q, k, v, is_causal=True, kernel_space="k")
    np.testing.assert_array_equal(np.asarray(o_auto), np.asarray(o_k))
    ref = attention_reference(q, k, v, is_causal=True)
    assert _cos(o_auto, ref) > (0.99 if name == "int4" else 0.999)


@pytest.mark.parametrize("causal", [False, True])
def test_k_space_lse_matches_q_space(causal):
    q, k, v = _qkv(key=2)
    ok, lse_k = lq.lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=causal, return_lse=True, kernel_space="k"
    )
    oq, lse_q = lq.lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=causal, return_lse=True, kernel_space="q"
    )
    assert lse_k.shape == lse_q.shape == q.shape[:3]
    assert float(jnp.max(jnp.abs(lse_k - lse_q))) < 2e-2
    assert _cos(ok, oq) > 0.9999


def test_k_space_nhd_layout_and_head_pad():
    # NHD layout + head_dim 48 (padded to 64) through the K-major route.
    q, k, v = _qkv(key=3, d=48)
    qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    o = lq.lowbit_fa_qk_int8_pv_fp16(qn, kn, vn, tensor_layout="NHD", is_causal=True)
    ref = attention_reference(q, k, v, is_causal=True)
    assert o.shape == qn.shape
    assert _cos(jnp.swapaxes(o, 1, 2), ref) > 0.999


def test_k_space_gqa():
    q, _, _ = _qkv(key=4, h=8)
    _, k, v = _qkv(key=5, h=2)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=True)
    ref = attention_reference(q, k, v, is_causal=True)
    assert _cos(o, ref) > 0.999


def test_int2_k_major_tracks_oracle():
    q, k, v = _qkv(key=6)
    o = lq.lowbit_fa_qk_int2_pv_fp16(q, k, v, is_causal=True)
    ref = attention_reference(q, k, v, is_causal=True)
    assert o.shape == q.shape
    assert _cos(o, ref) > 0.85  # 3-level K codes: coarse by construction


def test_varlen_k_space_matches_q_space():
    lens = [130, 70, 256]
    total = sum(lens)
    h, d = 4, 64
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (total, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (total, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (total, h, d), jnp.float32)
    cu = jnp.array(np.cumsum([0] + lens), jnp.int32)
    ok = lq.lowbit_fa_varlen(q, k, v, cu, cu, max(lens), max(lens),
                             is_causal=True, kernel_space="k")
    oq = lq.lowbit_fa_varlen(q, k, v, cu, cu, max(lens), max(lens),
                             is_causal=True, kernel_space="q")
    assert ok.shape == oq.shape == q.shape
    assert _cos(ok, oq) > 0.9999


@pytest.mark.parametrize("name", ["int8", "int4"])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_q_quant_bit_identical(name, causal):
    # fuse_quant=True on the K-major route quantizes Q in-kernel (hoisted
    # per-token quant + VMEM relayout) — must be BIT-identical to the
    # external quant_int8(layout="ds") path.
    fn, _ = WRAPPERS[name]
    q, k, v = _qkv(key=8)
    o_ext = fn(q, k, v, is_causal=causal, fuse_quant=False)
    o_fus = fn(q, k, v, is_causal=causal, fuse_quant=True)
    np.testing.assert_array_equal(np.asarray(o_ext), np.asarray(o_fus))


def test_fused_q_quant_varlen_bit_identical():
    lens = [130, 70, 256]
    total = sum(lens)
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (total, 4, 64), jnp.float32)
    k = jax.random.normal(ks[1], (total, 4, 64), jnp.float32)
    v = jax.random.normal(ks[2], (total, 4, 64), jnp.float32)
    cu = jnp.array(np.cumsum([0] + lens), jnp.int32)
    o_ext = lq.lowbit_fa_varlen(q, k, v, cu, cu, max(lens), max(lens),
                                is_causal=True, fuse_quant=False)
    o_fus = lq.lowbit_fa_varlen(q, k, v, cu, cu, max(lens), max(lens),
                                is_causal=True, fuse_quant=True)
    np.testing.assert_array_equal(np.asarray(o_ext), np.asarray(o_fus))


@pytest.mark.parametrize("space", ["k", "q"])
def test_pv_int8_both_spaces(space):
    # True int8 P@V (the reference FP8-P analog) in both kernel schedules.
    q, k, v = _qkv(key=10)
    o = lq.lowbit_fa_qk_int8_pv_int8(q, k, v, is_causal=True,
                                     kernel_space=space, pv_int8=True)
    ref = attention_reference(q, k, v, is_causal=True)
    assert _cos(o, ref) > 0.999


@pytest.mark.parametrize("name", ["int8", "int4"])
def test_smooth_q_exact_and_helps_outliers(name):
    # Q with a large common channel component (attention-sink style): the
    # per-token scale is dominated by it, so quantization coarsens. smooth_q
    # removes it exactly (bias = qm @ (K-km)^T rides the kernel's per-key
    # bias path) — accuracy must improve, never regress.
    fn, _ = WRAPPERS[name]
    q, k, v = _qkv(key=12)
    offset = jnp.zeros((1, 1, 1, 64)).at[..., :8].set(30.0)
    q = q + offset
    ref = attention_reference(q, k, v, is_causal=True)
    cos_plain = _cos(fn(q, k, v, is_causal=True), ref)
    cos_sq = _cos(fn(q, k, v, is_causal=True, smooth_q=True), ref)
    assert cos_sq >= cos_plain - 1e-6
    assert cos_sq > 0.999
    # and on well-behaved Q it must stay exact-class
    q2, k2, v2 = _qkv(key=13)
    ref2 = attention_reference(q2, k2, v2, is_causal=True)
    assert _cos(fn(q2, k2, v2, is_causal=True, smooth_q=True), ref2) > (0.999 if name == "int8" else 0.99)


def test_smooth_q_lse_contract():
    q, k, v = _qkv(key=14)
    q = q + jnp.zeros((1, 1, 1, 64)).at[..., :4].set(10.0)
    o, lse = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=True,
                                          smooth_q=True, return_lse=True)
    ref_o, ref_lse = attention_reference(q, k, v, is_causal=True, return_lse=True)
    assert _cos(o, ref_o) > 0.999
    assert float(jnp.max(jnp.abs(lse - ref_lse))) < 0.05


def test_gqa_return_lse_smooth_k():
    # Regression: _finish_lse's smooth-K correction under GQA used the
    # per-KV-head km directly against the full q head count (einsum label
    # mismatch). LSE must match the exact reference per q head.
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    b, hq, hk, s, d = 1, 8, 2, 512, 64
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.float32)
    o, lse = lq.lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=True, return_lse=True
    )
    kx = jnp.repeat(k, hq // hk, axis=1)
    vx = jnp.repeat(v, hq // hk, axis=1)
    ref_o, ref_lse = attention_reference(q, kx, vx, is_causal=True, return_lse=True)
    assert lse.shape == (b, hq, s)
    assert float(jnp.max(jnp.abs(lse - ref_lse))) < 3e-2
    assert _cos(o, ref_o) > 0.999
