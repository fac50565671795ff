"""Pallas low-bit attention kernel vs the fp32 oracle.

Two-tier strategy (sharpening the reference's accuracy-in-benchmark approach,
utils/benchmark.py:215-291):
  1. **kernel-exact**: feed random int8 codes + scales directly and compare
     against dequantize-then-exact-attention — isolates kernel bugs from
     quantization error entirely;
  2. **end-to-end**: quantize real (gaussian / integer-valued) tensors and
     check cosine similarity thresholds — measures quantization error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp, lowbit_attention
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _codes_and_scales(key=0, b=1, h=2, sq=256, sk=256, d=64, h_kv=None):
    h_kv = h_kv or h
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    q_codes = jax.random.randint(ks[0], (b, h, sq, d), -127, 128, jnp.int8)
    k_codes = jax.random.randint(ks[1], (b, h_kv, sk, d), -127, 128, jnp.int8)
    q_scale = jax.random.uniform(ks[2], (b, h, sq), minval=0.005, maxval=0.02)
    k_scale = jax.random.uniform(ks[3], (b, h_kv, sk), minval=0.005, maxval=0.02)
    v = jax.random.normal(ks[4], (b, h_kv, sk, d), jnp.float32)
    return q_codes, k_codes, q_scale, k_scale, v


def _dequant(codes, scale):
    return codes.astype(jnp.float32) * scale[..., None]


def _kernel_vs_oracle(qc, kc, qs, ksc, v, atol=2e-5, **kw):
    o = lowbit_attention(qc, kc, v, qs, ksc, pv_dtype=jnp.float32, out_dtype=jnp.float32, **kw)
    o_ref = attention_reference(
        _dequant(qc, qs), _dequant(kc, ksc), v,
        is_causal=kw.get("is_causal", False), sm_scale=kw.get("sm_scale"),
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=atol, rtol=1e-4)
    return o


# ---------------------------------------------------------------------------
# Tier 1: kernel-exact
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_int8_kernel_exact(causal):
    qc, kc, qs, ksc, v = _codes_and_scales()
    _kernel_vs_oracle(qc, kc, qs, ksc, v, is_causal=causal)


@pytest.mark.parametrize("sq,sk", [(256, 512), (512, 256), (130, 384), (256, 200), (64, 64)])
def test_int8_kernel_rect_and_ragged_shapes(sq, sk):
    qc, kc, qs, ksc, v = _codes_and_scales(1, sq=sq, sk=sk)
    _kernel_vs_oracle(qc, kc, qs, ksc, v)


@pytest.mark.parametrize("causal", [False, True])
def test_int8_kernel_gqa(causal):
    qc, kc, qs, ksc, v = _codes_and_scales(2, h=4, h_kv=2)
    _kernel_vs_oracle(qc, kc, qs, ksc, v, is_causal=causal)


def test_int8_kernel_custom_sm_scale():
    qc, kc, qs, ksc, v = _codes_and_scales(3)
    _kernel_vs_oracle(qc, kc, qs, ksc, v, sm_scale=0.25)


def test_int8_kernel_lse():
    qc, kc, qs, ksc, v = _codes_and_scales(4)
    o, lse2 = lowbit_attention(
        qc, kc, v, qs, ksc, pv_dtype=jnp.float32, out_dtype=jnp.float32, return_lse=True
    )
    _, lse_ref = attention_reference(_dequant(qc, qs), _dequant(kc, ksc), v, return_lse=True)
    lse_nat = np.asarray(lse2) / np.log2(np.e)
    np.testing.assert_allclose(lse_nat, np.asarray(lse_ref), atol=1e-4, rtol=1e-4)


def test_int8_kernel_segments():
    qc, kc, qs, ksc, v = _codes_and_scales(5)
    seg = jnp.concatenate([jnp.zeros((1, 100), jnp.int32), jnp.ones((1, 156), jnp.int32)], axis=1)
    o = lowbit_attention(
        qc, kc, v, qs, ksc, q_segment_ids=seg, kv_segment_ids=seg,
        pv_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    o_ref = attention_reference(
        _dequant(qc, qs), _dequant(kc, ksc), v, q_segment_ids=seg, kv_segment_ids=seg
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_int4_k_kernel_exact(causal):
    """int4 K codes fed as packed nibbles — exact vs dequantized oracle."""
    ks = jax.random.split(jax.random.PRNGKey(6), 5)
    b, h, sq, sk, d = 1, 2, 256, 256, 64
    qc = jax.random.randint(ks[0], (b, h, sq, d), -127, 128, jnp.int8)
    k4 = jax.random.randint(ks[1], (b, h, sk, d), -7, 8, jnp.int8)
    qs = jax.random.uniform(ks[2], (b, h, sq), minval=0.005, maxval=0.02)
    ksc = jax.random.uniform(ks[3], (b, h, sk), minval=0.05, maxval=0.2)
    v = jax.random.normal(ks[4], (b, h, sk, d), jnp.float32)
    # pack with the halves-of-D scheme
    lo = k4[..., : d // 2].astype(jnp.int32) & 0xF
    hi = k4[..., d // 2 :].astype(jnp.int32) & 0xF
    packed = (lo | (hi << 4)).astype(jnp.int8)
    o = lowbit_attention(
        qc, packed, v, qs, ksc, k_packed_int4=True, is_causal=causal,
        pv_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    o_ref = attention_reference(_dequant(qc, qs), _dequant(k4, ksc), v, is_causal=causal)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5, rtol=1e-4)


def test_int8_v_quantized_epilogue_exact():
    qc, kc, qs, ksc, _ = _codes_and_scales(7)
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    b, h, sk, d = 1, 2, 256, 64
    v_codes = jax.random.randint(ks[0], (b, h, sk, d), -127, 128, jnp.int8)
    v_scale = jax.random.uniform(ks[1], (b, h, d), minval=0.005, maxval=0.02)
    v_mean = jax.random.normal(ks[2], (b, h, d)) * 0.5
    v_deq = v_codes.astype(jnp.float32) * v_scale[:, :, None, :] + v_mean[:, :, None, :]
    o_ref = attention_reference(_dequant(qc, qs), _dequant(kc, ksc), v_deq)
    # pv_int8=False: epilogue math must be exact.
    o = lowbit_attention(
        qc, kc, v_codes, qs, ksc, v_scale=v_scale, v_mean=v_mean,
        pv_int8=False, pv_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5, rtol=1e-4)
    # pv_int8=True (default): P quantized to 8 bits -> near-exact.
    o8 = lowbit_attention(
        qc, kc, v_codes, qs, ksc, v_scale=v_scale, v_mean=v_mean,
        out_dtype=jnp.float32,
    )
    assert float(metrics.cosine_similarity(o8, o_ref)) > 0.999


def test_fp_baseline_kernel():
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    b, h, s, d = 1, 2, 384, 64
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    o = flash_attention_fp(q, k, v, is_causal=True)
    o_ref = attention_reference(q, k, v, is_causal=True)
    np.testing.assert_allclose(
        np.asarray(o, dtype=np.float32), np.asarray(o_ref), atol=3e-2, rtol=2e-2
    )


@pytest.mark.parametrize("causal", [False, True])
def test_static_max_matches_online(causal):
    """static_max (Cauchy-Schwarz bound) must reproduce the online-softmax
    result — requires real quantized codes (the bound assumes abs-max rows)."""
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q_f = jax.random.normal(ks[0], (1, 2, 512, 64))
    k_f = jax.random.normal(ks[1], (1, 2, 512, 64))
    v = jax.random.normal(ks[2], (1, 2, 512, 64))
    qc, qs = q_ops.quant_int8(q_f, gran="per_token")
    kc, ksc = q_ops.quant_int8(k_f, gran="per_token")
    o_on = lowbit_attention(qc, kc, v, qs, ksc, is_causal=causal,
                            pv_dtype=jnp.float32, out_dtype=jnp.float32)
    o_st = lowbit_attention(qc, kc, v, qs, ksc, is_causal=causal, static_max=True,
                            pv_dtype=jnp.float32, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(o_st), np.asarray(o_on), atol=1e-3, rtol=1e-3)
    # LSE must agree too (same contract)
    _, lse_on = lowbit_attention(qc, kc, v, qs, ksc, return_lse=True,
                                 pv_dtype=jnp.float32, out_dtype=jnp.float32)
    _, lse_st = lowbit_attention(qc, kc, v, qs, ksc, return_lse=True, static_max=True,
                                 pv_dtype=jnp.float32, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lse_st), np.asarray(lse_on), atol=1e-3, rtol=1e-4)


def test_masked_rows_zero_output_and_lse_sentinel():
    """Rows with zero valid keys must output exactly 0 (even with smooth_v)
    and emit the NEG_INIT LSE sentinel — in both softmax modes and both
    kernel schedules — so ring-style LSE recombination gives them weight 0."""
    from lowbit_quant_fa2_paddle_tpu.ops.attention import (
        lowbit_attention_km,
    )

    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    b, h, s, d = 1, 2, 256, 64
    q_f = jax.random.normal(ks[0], (b, h, s, d))
    k_f = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    qc, qs = q_ops.quant_int8(q_f, gran="per_token")
    kc, ksc = q_ops.quant_int8(k_f, gran="per_token")
    # second half of the q rows belongs to a segment with no keys at all
    qseg = jnp.concatenate(
        [jnp.zeros((b, s // 2), jnp.int32), jnp.ones((b, s // 2), jnp.int32)],
        axis=1,
    )
    kseg = jnp.zeros((b, s), jnp.int32)
    vm = jnp.mean(v, axis=2)  # [b, h, d] smooth-v mean
    for static in (False, True):
        o, lse = lowbit_attention(
            qc, kc, v, qs, ksc, v_mean=vm, q_segment_ids=qseg,
            kv_segment_ids=kseg, static_max=static, return_lse=True,
            pv_dtype=jnp.float32, out_dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(o[:, :, s // 2 :, :]), 0.0)
        assert np.all(np.asarray(lse[:, :, s // 2 :]) <= -1e29)
        assert np.all(np.isfinite(np.asarray(lse[:, :, : s // 2])))
    oT, lse = lowbit_attention_km(
        jnp.swapaxes(qc, 2, 3), kc, jnp.swapaxes(v, 2, 3), qs, ksc,
        v_mean=vm, q_segment_ids=qseg, kv_segment_ids=kseg, return_lse=True,
        pv_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(oT[:, :, :, s // 2 :]), 0.0)
    assert np.all(np.asarray(lse[:, :, s // 2 :]) <= -1e29)


def test_default_sm_scale_uses_qk_dim():
    """d_qk != d_v: the default softmax scale comes from the QK contraction
    dim, never from V's head dim."""
    qc, kc, qs, ksc, _ = _codes_and_scales(key=22, sq=128, sk=128, d=64)
    v = jax.random.normal(jax.random.PRNGKey(23), (1, 2, 128, 128), jnp.float32)
    o_def = lowbit_attention(qc, kc, v, qs, ksc,
                             pv_dtype=jnp.float32, out_dtype=jnp.float32)
    o_exp = lowbit_attention(qc, kc, v, qs, ksc, sm_scale=1.0 / 8.0,
                             pv_dtype=jnp.float32, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(o_def), np.asarray(o_exp))


def test_int8_codes_without_scales_rejected():
    """int8 q/k with no scales must raise, not silently run the float path."""
    qc, kc, _, _, v = _codes_and_scales(key=24, sq=128, sk=128)
    with pytest.raises(AssertionError):
        lowbit_attention(qc, kc, v)


# ---------------------------------------------------------------------------
# Tier 2: end-to-end quant + kernel accuracy
# ---------------------------------------------------------------------------


def test_e2e_int8_gaussian_accuracy():
    ks = jax.random.split(jax.random.PRNGKey(10), 3)
    b, h, s, d = 2, 4, 384, 64
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    q_codes, q_scale = q_ops.quant_int8(q, gran="per_token")
    k_codes, k_scale = q_ops.quant_int8(k, gran="per_token")
    o = lowbit_attention(q_codes, k_codes, v, q_scale, k_scale,
                         pv_dtype=jnp.float32, out_dtype=jnp.float32)
    o_ref = attention_reference(q, k, v)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.9995


def test_kernel_is_jittable():
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 64))
    k = jax.random.normal(ks[1], (1, 2, 256, 64))
    v = jax.random.normal(ks[2], (1, 2, 256, 64))

    @jax.jit
    def f(q, k, v):
        q_codes, q_scale = q_ops.quant_int8(q, gran="per_token")
        k_codes, k_scale = q_ops.quant_int8(k, gran="per_token")
        return lowbit_attention(q_codes, k_codes, v, q_scale, k_scale,
                                pv_dtype=jnp.float32, out_dtype=jnp.float32)

    o = f(q, k, v)
    o_ref = attention_reference(q, k, v)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


class TestFusedQuant:
    """fuse_quant=True must be bit-identical to the external per-token path
    (same math, in-kernel)."""

    def _setup(self, causal):
        ks = jax.random.split(jax.random.PRNGKey(21), 3)
        q = jax.random.normal(ks[0], (2, 4, 256, 64), jnp.bfloat16)
        k = jax.random.normal(ks[1], (2, 4, 256, 64), jnp.bfloat16) + 0.5
        v = jax.random.normal(ks[2], (2, 4, 256, 64), jnp.bfloat16)
        return q, k, v

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_external_path(self, causal):
        from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16

        q, k, v = self._setup(causal)
        kw = dict(is_causal=causal, block_q=128, block_kv=128, return_lse=True)
        o_ext, lse_ext = lowbit_fa_qk_int8_pv_fp16(q, k, v, **kw)
        o_fus, lse_fus = lowbit_fa_qk_int8_pv_fp16(q, k, v, fuse_quant=True, **kw)
        np.testing.assert_array_equal(np.asarray(o_fus), np.asarray(o_ext))
        np.testing.assert_array_equal(np.asarray(lse_fus), np.asarray(lse_ext))

    def test_no_smooth_k_and_gqa(self):
        from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16

        q, k, v = self._setup(False)
        k2, v2 = k[:, :2], v[:, :2]  # GQA: 4 q heads over 2 kv heads
        kw = dict(smooth_k=False, block_q=128, block_kv=128)
        o_ext = lowbit_fa_qk_int8_pv_fp16(q, k2, v2, **kw)
        o_fus = lowbit_fa_qk_int8_pv_fp16(q, k2, v2, fuse_quant=True, **kw)
        np.testing.assert_array_equal(np.asarray(o_fus), np.asarray(o_ext))


class TestHybridFusedQ:
    """fuse_quant="q" (Q in-kernel, K external pre-transposed codes) must be
    bit-identical to the fully external per-token path."""

    def _setup(self):
        ks = jax.random.split(jax.random.PRNGKey(23), 3)
        q = jax.random.normal(ks[0], (2, 4, 300, 64), jnp.bfloat16)
        k = jax.random.normal(ks[1], (2, 4, 300, 64), jnp.bfloat16) + 0.5
        v = jax.random.normal(ks[2], (2, 4, 300, 64), jnp.bfloat16)
        return q, k, v

    @pytest.mark.parametrize("causal", [False, True])
    def test_int8_matches_external(self, causal):
        from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int8_pv_fp16

        q, k, v = self._setup()
        kw = dict(is_causal=causal, block_q=128, block_kv=128, return_lse=True)
        o_ext, lse_ext = lowbit_fa_qk_int8_pv_fp16(q, k, v, fuse_quant=False, **kw)
        o_hyb, lse_hyb = lowbit_fa_qk_int8_pv_fp16(q, k, v, fuse_quant="q", **kw)
        np.testing.assert_array_equal(np.asarray(o_hyb), np.asarray(o_ext))
        np.testing.assert_array_equal(np.asarray(lse_hyb), np.asarray(lse_ext))

    def test_int4_matches_external(self):
        from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int4_pv_fp16

        q, k, v = self._setup()
        kw = dict(block_q=128, block_kv=128)
        o_ext = lowbit_fa_qk_int4_pv_fp16(q, k, v, fuse_quant=False, **kw)
        o_hyb = lowbit_fa_qk_int4_pv_fp16(q, k, v, fuse_quant="q", **kw)
        np.testing.assert_array_equal(np.asarray(o_hyb), np.asarray(o_ext))

    def test_varlen_matches_external(self):
        from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_varlen

        ks = jax.random.split(jax.random.PRNGKey(24), 3)
        t, h, d = 350, 4, 64
        q = jax.random.normal(ks[0], (t, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (t, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (t, h, d), jnp.bfloat16)
        cu = jnp.asarray([0, 120, 350], jnp.int32)
        o_ext = lowbit_fa_varlen(q, k, v, cu, cu, is_causal=True, fuse_quant=False)
        o_hyb = lowbit_fa_varlen(q, k, v, cu, cu, is_causal=True, fuse_quant="q")
        np.testing.assert_array_equal(np.asarray(o_hyb), np.asarray(o_ext))


def test_fused_int4_matches_packed_path():
    """lowbit_fa_qk_int4_pv_fp16's in-kernel K-int4 quant (fuse_quant) is
    bit-identical to the packed external path — packing only changes
    storage, not values."""
    from lowbit_quant_fa2_paddle_tpu.core import lowbit_fa_qk_int4_pv_fp16

    ks = jax.random.split(jax.random.PRNGKey(22), 3)
    q = jax.random.normal(ks[0], (2, 4, 256, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, 4, 256, 64), jnp.bfloat16) + 0.3
    v = jax.random.normal(ks[2], (2, 4, 256, 64), jnp.bfloat16)
    for causal in (False, True):
        kw = dict(is_causal=causal, block_q=128, block_kv=128)
        o_ext = lowbit_fa_qk_int4_pv_fp16(q, k, v, fuse_quant=False, **kw)
        o_fus = lowbit_fa_qk_int4_pv_fp16(q, k, v, **kw)
        np.testing.assert_array_equal(np.asarray(o_fus), np.asarray(o_ext))
