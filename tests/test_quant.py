"""Pallas quantization kernels vs the pure-jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import (
    dequant_symmetric_ref,
    quant_symmetric_ref,
)


def _x(key=0, b=2, h=3, s=200, d=64, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), (b, h, s, d), dtype) * 2.0


@pytest.mark.parametrize("gran,block", [("per_block", 128), ("per_block", 64), ("per_token", 128)])
def test_quant_int8_matches_oracle(gran, block):
    x = _x()
    codes, scale = q_ops.quant_int8(x, gran=gran, block=block)
    assert codes.shape == x.shape and codes.dtype == jnp.int8
    assert scale.shape == x.shape[:3]
    ref_block = 1 if gran == "per_token" else block
    codes_ref, scale_ref = quant_symmetric_ref(x, bits=8, block=ref_block)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_ref))
    scale_rows_ref = np.repeat(np.asarray(scale_ref), ref_block, axis=2)[:, :, : x.shape[2]]
    np.testing.assert_allclose(np.asarray(scale), scale_rows_ref, rtol=1e-5)


def test_quant_int8_fused_k_mean():
    x = _x(1)
    km = q_ops.k_mean(x)
    codes, scale = q_ops.quant_int8(x, km, gran="per_token")
    codes_ref, scale_ref = quant_symmetric_ref(x - km.astype(x.dtype), bits=8, block=1)
    # mean subtraction in f32 vs cast: allow ±1 code of slack
    assert np.abs(np.asarray(codes, np.int32) - np.asarray(codes_ref, np.int32)).max() <= 1


def test_quant_int8_xla_backend_equivalent():
    x = _x(2)
    c_p, s_p = q_ops.quant_int8(x, gran="per_token")
    c_x, s_x = q_ops.quant_int8(x, gran="per_token", backend="xla")
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-6)


@pytest.mark.parametrize("backend", ["pallas", "xla"])
@pytest.mark.parametrize("gran", ["per_block", "per_token"])
def test_quant_int8_transposed_layout(gran, backend):
    # layout="ds" must be exactly swapaxes(2,3) of the "ns" codes — the
    # attention kernel consumes K^T [B,H,D,S] straight from the quantizer.
    x = _x(6, s=200)
    c_ns, s_ns = q_ops.quant_int8(x, gran=gran, backend=backend)
    c_ds, s_ds = q_ops.quant_int8(x, gran=gran, backend=backend, layout="ds")
    assert c_ds.shape == (x.shape[0], x.shape[1], x.shape[3], x.shape[2])
    np.testing.assert_array_equal(np.asarray(c_ds), np.asarray(jnp.swapaxes(c_ns, 2, 3)))
    np.testing.assert_allclose(np.asarray(s_ds), np.asarray(s_ns), rtol=1e-6)


def test_quant_int8_non_multiple_seq():
    x = _x(3, s=130)
    codes, scale = q_ops.quant_int8(x, gran="per_block", block=128)
    assert codes.shape == x.shape
    x_dq = np.asarray(codes, np.float32) * np.asarray(scale)[..., None]
    assert float(metrics.cosine_similarity(jnp.asarray(x_dq), x)) > 0.999


@pytest.mark.parametrize("gran", ["per_block", "per_token"])
def test_quant_int4_pack_roundtrip(gran):
    x = _x(4, d=32)
    packed, scale = q_ops.quant_int4(x, gran=gran, block=64)
    assert packed.shape == (*x.shape[:3], x.shape[3] // 2)
    codes = q_ops.unpack_int4(packed)
    assert int(jnp.max(codes)) <= 7 and int(jnp.min(codes)) >= -7
    x_dq = codes.astype(jnp.float32) * scale[..., None]
    assert float(metrics.cosine_similarity(x_dq, x)) > (0.985 if gran == "per_block" else 0.995)


def test_quant_v_per_channel():
    v = _x(5) + 1.5  # offset so smooth_v matters
    codes, scale, vm = q_ops.quant_v_int8_per_channel(v, smooth_v=True)
    assert vm is not None and vm.shape == (v.shape[0], v.shape[1], v.shape[3])
    v_dq = codes.astype(jnp.float32) * scale[:, :, None, :] + vm[:, :, None, :]
    assert float(metrics.cosine_similarity(v_dq, v)) > 0.9999
    # without smoothing
    codes2, scale2, vm2 = q_ops.quant_v_int8_per_channel(v, smooth_v=False)
    assert vm2 is None
    v_dq2 = codes2.astype(jnp.float32) * scale2[:, :, None, :]
    assert float(metrics.cosine_similarity(v_dq2, v)) > 0.999
