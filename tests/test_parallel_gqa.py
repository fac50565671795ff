"""GQA through the distributed strategies (heads don't equal kv-heads)."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference
from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
from lowbit_quant_fa2_paddle_tpu.parallel.ring import ring_attention
from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import ulysses_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _gqa_qkv(key=0, b=1, h=8, hk=2, s=256, d=64):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    return q, k, v


def test_ring_attention_gqa():
    q, k, v = _gqa_qkv(0)
    mesh = make_mesh({"seq": 4})
    spec = P(None, None, "seq", None)
    fn = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name="seq", is_causal=True),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )
    )
    o = fn(q, k, v)
    o_ref = attention_reference(q, k, v, is_causal=True)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


def test_ring_attention_gqa_lse():
    """GQA + smooth_k + return_lse: the smooth-K LSE correction must
    broadcast the kv-head means to the q heads."""
    import numpy as np

    q, k, v = _gqa_qkv(2, s=128)
    mesh = make_mesh({"seq": 4})
    spec = P(None, None, "seq", None)
    fn = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name="seq", return_lse=True),
            mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=(spec, P(None, None, "seq")), check_vma=False,
        )
    )
    o, lse = fn(q, k, v)
    o_ref, lse_ref = attention_reference(q, k, v, return_lse=True)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=2e-2, rtol=2e-3)


def test_ulysses_gqa():
    """Ulysses with GQA: kv heads must also divide the axis -> hk=4, n=2."""
    q, k, v = _gqa_qkv(1, h=8, hk=4)
    mesh = make_mesh({"seq": 2})
    spec = P(None, None, "seq", None)
    fn = jax.jit(
        jax.shard_map(
            lambda q, k, v: ulysses_attention(q, k, v, axis_name="seq"),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
        )
    )
    o = fn(q, k, v)
    assert float(metrics.cosine_similarity(o, attention_reference(q, k, v))) > 0.999
