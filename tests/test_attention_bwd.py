"""Flash attention backward: gradients must match differentiating the exact
attention (the reference has no backward at all — this exceeds parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import flash_attention_trainable
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity


def _qkv(key=0, b=1, h=2, s=512, d=64):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_exact(causal):
    q, k, v = _qkv(0)
    t = jax.random.normal(jax.random.PRNGKey(9), q.shape)  # cotangent target

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, causal)
        return jnp.sum(o.astype(jnp.float32) * t)

    def loss_exact(q, k, v):
        o = attention_reference(q, k, v, is_causal=causal)
        return jnp.sum(o.astype(jnp.float32) * t)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_e = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_f, g_e):
        cos = float(cosine_similarity(a, b))
        assert cos > 0.999, (name, cos)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2, err_msg=name
        )


def test_forward_value_matches():
    q, k, v = _qkv(1)
    o = flash_attention_trainable(q, k, v)
    o_ref = attention_reference(q, k, v)
    assert float(cosine_similarity(o, o_ref)) > 0.999


def test_trainable_in_jit_grad_loop():
    q, k, v = _qkv(2, s=256)

    @jax.jit
    def step(q):
        return jax.grad(
            lambda q: jnp.sum(flash_attention_trainable(q, k, v, True).astype(jnp.float32) ** 2)
        )(q)

    g = step(q)
    assert jnp.isfinite(g).all()


def test_lowbit_trainable_grads_match_fp():
    # INT8-forward / fp-backward (STE): gradients must track the exact fp
    # flash gradients closely (quantized residuals perturb them only at the
    # quantization-noise level).
    from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
        flash_attention_trainable,
        lowbit_attention_trainable,
    )
    from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    b, h, s, d = 1, 2, 512, 64
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    tgt = jax.random.normal(ks[3], (b, h, s, d), jnp.float32)

    def loss_q(q, k, v):
        return jnp.mean((lowbit_attention_trainable(q, k, v, True) - tgt) ** 2)

    def loss_fp(q, k, v):
        return jnp.mean((flash_attention_trainable(q, k, v, True) - tgt) ** 2)

    gq = jax.grad(loss_q, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_fp, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gq, gf):
        # int8 quantization noise in the residuals propagates through the
        # softmax jacobian; measured ~0.995 cos at this shape.
        assert float(cosine_similarity(a, b_)) > 0.99


@pytest.mark.parametrize("hk", [1, 2])
@pytest.mark.parametrize("causal", [False, True])
def test_gqa_grads_match_exact(hk, causal):
    """GQA/MQA gradient path: dk/dv accumulate the whole q-head group
    in-kernel (grid inner dim walks (group head, q block) pairs)."""
    b, h, s, d = 1, 4, 384, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.float32)
    t = jax.random.normal(ks[3], q.shape)

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, causal, None, 128, 128)
        return jnp.sum(o.astype(jnp.float32) * t)

    def loss_exact(q, k, v):
        o = attention_reference(q, k, v, is_causal=causal)
        return jnp.sum(o.astype(jnp.float32) * t)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_e = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_f, g_e):
        assert a.shape == b_.shape, (name, a.shape, b_.shape)
        cos = float(cosine_similarity(a, b_))
        assert cos > 0.999, (name, cos)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-2, rtol=5e-2, err_msg=name
        )


@pytest.mark.parametrize("seed", range(4))
def test_bwd_fuzz_shapes(seed):
    """Randomized backward fuzz: shapes, GQA group, causal flag, block
    sizes — gradients must track jax.grad of the exact oracle."""
    import random as _random

    rng = _random.Random(seed)
    g = rng.choice([1, 2, 4])
    hk = rng.choice([1, 2])
    h = hk * g
    s = rng.choice([256, 384, 512])
    d = rng.choice([64, 128])
    causal = rng.random() < 0.5
    bq = rng.choice([128, 256])
    ks = jax.random.split(jax.random.PRNGKey(seed + 100), 4)
    q = jax.random.normal(ks[0], (1, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (1, hk, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (1, hk, s, d), jnp.float32)
    t = jax.random.normal(ks[3], q.shape)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, causal, None, bq, bq) * t)

    def loss_exact(q, k, v):
        return jnp.sum(attention_reference(q, k, v, is_causal=causal).astype(jnp.float32) * t)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_e = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    cfg = dict(h=h, hk=hk, s=s, d=d, causal=causal, bq=bq)
    for name, a, b_ in zip("qkv", g_f, g_e):
        cos = float(cosine_similarity(a, b_))
        assert cos > 0.999, (name, cos, cfg)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_non_multiple_seq(causal):
    """Backward on non-block-multiple lengths (zero-pad + inf-LSE padding;
    the flagship DiT trains at s=17776, not a block multiple)."""
    b, h, s, d = 1, 2, 300, 64
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    t = jax.random.normal(ks[3], q.shape)

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, causal, None, 128, 128)
        return jnp.sum(o.astype(jnp.float32) * t)

    def loss_exact(q, k, v):
        o = attention_reference(q, k, v, is_causal=causal)
        return jnp.sum(o.astype(jnp.float32) * t)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_e = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_f, g_e):
        assert a.shape == b_.shape
        assert not bool(jnp.any(jnp.isnan(a))), name
        cos = float(cosine_similarity(a, b_))
        assert cos > 0.999, (name, cos)


def test_quantized_backward_grads():
    """bwd_quantized=True (int8-code backward dots): grads stay ~1e-4 of
    the oracle; the option is speed-closed on v5e (PERFORMANCE.md r3) but
    remains the half-HBM-traffic / QAT-consistent-gradient path."""
    import jax
    import jax.numpy as jnp
    from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
        lowbit_attention_trainable,
    )
    from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    B, H, S, D = 1, 2, 256, 64
    q, k, v, g = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)

    def ref(q, k, v):
        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) / (D ** 0.5)
        p = jax.nn.softmax(s, -1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, vf) * g.astype(jnp.float32))

    rg = jax.grad(ref, (0, 1, 2))(q, k, v)

    def loss(q, k, v):
        return jnp.sum(
            lowbit_attention_trainable(q, k, v, False, None, None, None, True) * g
        )

    grads = jax.jit(jax.grad(loss, (0, 1, 2)))(q, k, v)
    for got, want in zip(grads, rg):
        assert float(cosine_similarity(got.astype(jnp.float32), want)) > 0.9995
