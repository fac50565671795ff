"""Drop-in signature parity with the reference: positional call patterns,
extra-kwarg tolerance, smooth_v with float V, quantization_backend."""

import jax
import jax.numpy as jnp
import numpy as np

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _qkv(key=0, b=1, h=4, s=256, d=64):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(kk, (b, h, s, d)) for kk in ks)


def test_positional_call_reference_style():
    """Reference callers pass tensor_layout etc. positionally
    (src/core.py:194-204 signature order)."""
    q, k, v = _qkv(0)
    # (q, k, v, tensor_layout, quantization_backend, is_causal)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, "HND", "pallas", True)
    o_ref = attention_reference(q, k, v, is_causal=True)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


def test_extra_kwargs_swallowed():
    """Reference fns accept **kwargs and ignore extras (drop-in callers pass
    framework-specific junk)."""
    q, k, v = _qkv(1)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, some_unknown_flag=123)
    assert o.shape == q.shape


def test_quantization_backend_xla_matches_pallas():
    q, k, v = _qkv(2)
    o_p = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, quantization_backend="pallas")
    o_x = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, quantization_backend="xla")
    np.testing.assert_allclose(
        np.asarray(o_p, np.float32), np.asarray(o_x, np.float32), atol=1e-4
    )


def test_smooth_v_float_v():
    """smooth_v on the fp16-PV path (reference sageattn_qk_int8_pv_fp16_cuda
    smooth_v=True): identical output, improved conditioning under V offset."""
    q, k, v = _qkv(3)
    v = v + 3.0
    o_s = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, smooth_v=True)
    o_ref = attention_reference(q, k, v)
    assert float(metrics.cosine_similarity(o_s, o_ref)) > 0.999


def test_varlen_max_seqlen_args():
    """Reference varlen signature includes max_seqlen_q/k positionally
    (src/core.py:356-363) — accepted (unused on TPU)."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    t, h, d = 128, 2, 64
    q = jax.random.normal(ks[0], (t, h, d))
    k = jax.random.normal(ks[1], (t, h, d))
    v = jax.random.normal(ks[2], (t, h, d))
    cu = jnp.array([0, 64, 128], jnp.int32)
    o = lq.lowbit_fa_varlen(q, k, v, cu, cu, 64, 64, True)
    assert o.shape == q.shape
