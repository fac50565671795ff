"""Property-style shape sweep: the int8 kernel must track the oracle across
a broad grid of shapes, layouts, and option combinations (beyond the
targeted unit tests — catches index-map/padding edge paths)."""

import itertools

import jax
import jax.numpy as jnp
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference

CASES = [
    # (b, h, hk, sq, sk, d, causal)
    (1, 1, 1, 128, 128, 64, False),
    (3, 5, 1, 200, 333, 64, True),      # MQA, ragged both dims
    (2, 6, 3, 513, 257, 128, False),    # GQA, odd sizes, hd128
    (1, 2, 2, 64, 2048, 64, False),     # short q, long kv
    (1, 2, 2, 1031, 1031, 96, True),    # head_dim 96 (pads to 128)
    (2, 4, 4, 300, 300, 32, True),      # head_dim 32 (pads to 64)
    (1, 2, 1, 384, 384, 192, True),     # head_dim 192 (pads to 256), MQA
    (1, 2, 2, 511, 513, 256, False),    # head_dim 256 (reference dispatch
                                        # ceiling, dispatch_utils.h:23-99)
]


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_int8_shape_grid(case):
    b, h, hk, sq, sk, d, causal = case
    ks = jax.random.split(jax.random.PRNGKey(hash(case) % 2**31), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d))
    k = jax.random.normal(ks[1], (b, hk, sk, d))
    v = jax.random.normal(ks[2], (b, hk, sk, d))
    # pad head dim like the public API does
    import lowbit_quant_fa2_paddle_tpu.core as core

    o = core.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=causal)
    o_ref = attention_reference(q, k, v, is_causal=causal)
    cos = float(metrics.cosine_similarity(o, o_ref))
    assert cos > 0.999, (case, cos)


@pytest.mark.parametrize("block_q,block_kv", [(128, 128), (256, 512), (512, 256)])
def test_int8_block_size_grid(block_q, block_kv):
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (1, 2, 700, 64))
    k = jax.random.normal(ks[1], (1, 2, 700, 64))
    v = jax.random.normal(ks[2], (1, 2, 700, 64))
    qc, qs = q_ops.quant_int8(q, gran="per_token")
    kc, ksc = q_ops.quant_int8(k, gran="per_token")
    o = lowbit_attention(qc, kc, v, qs, ksc, is_causal=True,
                         block_q=block_q, block_kv=block_kv,
                         pv_dtype=jnp.float32, out_dtype=jnp.float32)
    o_ref = attention_reference(q, k, v, is_causal=True)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_fused_q_shape_grid(case):
    """fuse_quant=True (in-kernel Q quant + relayout on the K-major route)
    must be BIT-identical to external quant across the full shape grid —
    edge blocks, GQA, head-dim padding included."""
    import numpy as np

    import lowbit_quant_fa2_paddle_tpu.core as core

    b, h, hk, sq, sk, d, causal = case
    ks = jax.random.split(jax.random.PRNGKey(hash(case) % 2**31), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d))
    k = jax.random.normal(ks[1], (b, hk, sk, d))
    v = jax.random.normal(ks[2], (b, hk, sk, d))
    o_ext = core.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=causal, fuse_quant=False)
    o_fus = core.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=causal, fuse_quant=True)
    np.testing.assert_array_equal(np.asarray(o_ext), np.asarray(o_fus))
