"""Fused weight-quantized matmul (ops/gemv.py) vs dense/dequant oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import gemv
from lowbit_quant_fa2_paddle_tpu.ops import metrics


def _wx(m=3, n=384, k=512, key=0):
    w = jax.random.normal(jax.random.PRNGKey(key), (n, k), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(key + 1), (m, k), jnp.float32)
    return w, x


@pytest.mark.parametrize("bits", [8, 4, 2])
@pytest.mark.parametrize("gs", [64, 128])
def test_grouped_fused_matches_dequant_oracle(bits, gs):
    w, x = _wx()
    packed, scale, mn = gemv.pack_weights(w, group_size=gs, bits=bits)
    codes = gemv.unpack_weights(packed, bits=bits)
    assert int(jnp.min(codes)) >= 0 and int(jnp.max(codes)) < 2**bits
    n, k = w.shape
    w_dq = (
        codes.astype(jnp.float32).reshape(n, k // gs, gs) * scale[..., None]
        + mn[..., None]
    ).reshape(n, k)
    # pack→unpack must reconstruct the quantized weight (order preserved)
    assert float(metrics.cosine_similarity(jnp.asarray(w_dq), w)) > {8: 0.9999, 4: 0.995, 2: 0.88}[bits]
    y = gemv.wq_matmul_fused(x, packed, scale, mn, bits=bits, group_size=gs)
    y_ref = x @ w_dq.T
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-3, atol=2e-4)


def test_grouped_fused_no_mn_is_scale_only():
    w, x = _wx(key=3)
    packed, scale, mn = gemv.pack_weights(w, group_size=128, bits=4)
    codes = gemv.unpack_weights(packed, bits=4)
    n, k = w.shape
    w_s = (codes.astype(jnp.float32).reshape(n, k // 128, 128) * scale[..., None]).reshape(n, k)
    y = gemv.wq_matmul_fused(x, packed, scale, None, bits=4, group_size=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w_s.T), rtol=2e-3, atol=2e-4)


def test_grouped_fused_lead_dims_and_bf16():
    w, _ = _wx(key=4)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 3, 512), jnp.bfloat16)
    packed, scale, mn = gemv.pack_weights(w, group_size=128, bits=8)
    y = gemv.wq_matmul_fused(x, packed, scale, mn, bits=8, group_size=128)
    assert y.shape == (2, 3, 384) and y.dtype == jnp.bfloat16
    ref = x.reshape(6, 512).astype(jnp.float32) @ w.T
    assert float(metrics.cosine_similarity(y.reshape(6, 384), jnp.asarray(ref))) > 0.999


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("activation", ["bf16", "int8"])
def test_per_channel_fast_path(bits, activation):
    w, x = _wx(key=5)
    packed, scale = gemv.pack_weights_per_channel(w, bits=bits)
    y = gemv.wq_matmul_per_channel(x, packed, scale, bits=bits, activation=activation)
    ref = x @ w.T
    thresh = 0.999 if bits == 8 else 0.985
    assert float(metrics.cosine_similarity(y, jnp.asarray(ref))) > thresh


def test_large_m_routes_to_dense_and_matches():
    """m >= 1024 takes the dequant-once + dense-MXU route; results must
    agree with the streaming kernel's math."""
    w, _ = _wx(key=8, n=256, k=256)
    x_small = jax.random.normal(jax.random.PRNGKey(10), (4, 256), jnp.float32)
    x_big = jnp.tile(x_small, (256, 1))  # 1024 rows, rows 0-3 repeated
    # grouped
    p, s, mn = gemv.pack_weights(w, group_size=128, bits=4)
    y_small = gemv.wq_matmul_fused(x_small, p, s, mn, bits=4, group_size=128)
    y_big = gemv.wq_matmul_fused(x_big, p, s, mn, bits=4, group_size=128)
    np.testing.assert_allclose(
        np.asarray(y_big[:4]), np.asarray(y_small), rtol=3e-3, atol=3e-3
    )
    # per-channel (both bit widths; 4-bit checks the unsigned-bias unpack)
    for bits in (8, 4):
        pc, sc = gemv.pack_weights_per_channel(w, bits=bits)
        y_small = gemv.wq_matmul_per_channel(x_small, pc, sc, bits=bits)
        y_big = gemv.wq_matmul_per_channel(x_big, pc, sc, bits=bits)
        np.testing.assert_allclose(
            np.asarray(y_big[:4]), np.asarray(y_small), rtol=3e-3, atol=3e-3
        )


def test_wqlinear_fused_backend():
    from lowbit_quant_fa2_paddle_tpu.ops.pack import WQLinear

    w, x = _wx(m=4, key=6)
    lin = WQLinear.from_dense(w, bias=jnp.ones((384,)), group_size=128, bits=4)
    y_host = lin(x)
    lin_f = WQLinear.from_dense(w, bias=jnp.ones((384,)), group_size=128, bits=4, backend="fused")
    y_fused = lin_f(x)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_host, np.float32), rtol=3e-3, atol=3e-3
    )


# ---------------------------------------------------------------------------
# Differentiable path (MatMul4Bit / WQLinearForTrain parity)
# ---------------------------------------------------------------------------


def _loss_and_grad(fn, x):
    return jax.value_and_grad(lambda x: jnp.sum(jnp.sin(fn(x))))(x)


@pytest.mark.parametrize("fmt", ["grouped", "per_channel8", "per_channel4"])
def test_wq_matmul_trainable_grad_matches_dequant(fmt):
    """custom_vjp activation grad == autodiff through the dequantized dense
    weight (the reference MatMul4Bit.backward contract, qmodule.py:47-63)."""
    w, x = _wx(m=5, key=20)
    if fmt == "grouped":
        p, s, mn = gemv.pack_weights(w, group_size=128, bits=4)
        fused = lambda x: gemv.wq_matmul_trainable(x, p, s, mn, bits=4, group_size=128)
        w_deq = gemv.dequant_weights(p, s, mn, bits=4, group_size=128)
    else:
        bits = 8 if fmt == "per_channel8" else 4
        p, s = gemv.pack_weights_per_channel(w, bits=bits)
        fused = lambda x: gemv.wq_matmul_trainable(x, p, s, bits=bits)
        w_deq = gemv.dequant_weights(p, s, bits=bits)
    dense = lambda x: jnp.einsum("mk,nk->mn", x, w_deq)

    y_f, g_f = _loss_and_grad(fused, x)
    y_d, g_d = _loss_and_grad(dense, x)
    # forward: fused kernel vs dense dequant matmul (same codes)
    np.testing.assert_allclose(float(y_f), float(y_d), rtol=2e-3, atol=2e-2)
    # backward: analytically identical (g @ W_deq) up to the f32/bf16 cast
    assert float(metrics.cosine_similarity(g_f, g_d)) > 0.9995


def test_wqlinear_trainable_end_to_end():
    """Grad flows through a trainable WQLinear stack (both backends), the
    frozen quantization params receive none — WQLinearForTrain semantics."""
    from lowbit_quant_fa2_paddle_tpu.ops.pack import WQLinear

    w, x = _wx(m=4, key=22)
    for backend in ("host", "fused"):
        base = WQLinear.from_dense(w, group_size=128, bits=4,
                                   backend=backend, trainable=True)

        def loss(x, b, scale, mn):
            lin = type(base)(base.packed_w, scale, mn, b, base.group_size,
                             base.bits, base.backend, trainable=True)
            return jnp.sum(lin(x) ** 2)

        gx, gb, gs, gm = jax.grad(loss, argnums=(0, 1, 2, 3))(
            x, jnp.zeros((384,)), base.scale, base.mn)
        assert gx.shape == x.shape and bool(jnp.any(gx != 0))
        assert gb.shape == (384,) and bool(jnp.any(gb != 0))
        # quantization params are FROZEN on both backends (no crash, zero grad)
        assert not bool(jnp.any(gs != 0)) and not bool(jnp.any(gm != 0)), backend


def test_wq_matmul_trainable_rejects_mn_with_per_channel_scale():
    w, x = _wx(m=3, key=24)
    p, s = gemv.pack_weights_per_channel(w, bits=4)
    _, mn = jnp.zeros(()), jnp.zeros((384, 4))
    with pytest.raises(AssertionError):
        gemv.wq_matmul_trainable(x, p, s, mn, bits=4)
