"""Group pack/unpack (KIVI-style) and quantized matmul tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import pack
from lowbit_quant_fa2_paddle_tpu.ops import metrics


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_pack_unpack_roundtrip(bits):
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (3, 5, 64), 0, 2**bits, jnp.int32)
    packed = pack.pack_along_last_dim(codes, bits)
    assert packed.shape == (3, 5, 64 * bits // 32)
    out = pack.unpack_along_last_dim(packed, bits)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


@pytest.mark.parametrize("bits,cos_min", [(2, 0.93), (4, 0.995), (8, 0.9999)])
def test_quantize_pack_dequant(bits, cos_min):
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 128)) * 2 + 1
    packed, scale, mn = pack.quantize_and_pack_along_last_dim(x, group_size=32, bits=bits)
    x_dq = pack.unpack_and_dequant_along_last_dim(packed, scale, mn, group_size=32, bits=bits)
    assert not np.isnan(np.asarray(x_dq)).any()
    assert float(metrics.cosine_similarity(x_dq, x)) > cos_min


@pytest.mark.parametrize("bits", [4, 8])
def test_quantized_matmul(bits):
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (5, 256))
    w = jax.random.normal(kw, (64, 256)) * 0.1
    packed, scale, mn = pack.quantize_and_pack_along_last_dim(w, group_size=64, bits=bits)
    y = pack.quantized_matmul(x, packed, scale, mn, group_size=64, bits=bits)
    y_ref = x @ w.T
    assert float(metrics.cosine_similarity(y, y_ref)) > (0.999 if bits == 8 else 0.99)


def test_wqlinear():
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (2, 7, 128))
    w = jax.random.normal(kw, (32, 128)) * 0.1
    b = jax.random.normal(kb, (32,))
    layer = pack.WQLinear.from_dense(w, b, group_size=32, bits=4)
    y = layer(x)
    y_ref = x @ w.T + b
    assert y.shape == (2, 7, 32)
    assert float(metrics.cosine_similarity(y, y_ref)) > 0.99
    # jit-able
    y2 = jax.jit(layer)(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-4, atol=1e-5)
