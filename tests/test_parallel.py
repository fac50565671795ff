"""Distributed layer tests on the 8-device CPU mesh: every strategy must
reproduce dense single-device attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference
from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
from lowbit_quant_fa2_paddle_tpu.parallel.ring import make_ring_attention
from lowbit_quant_fa2_paddle_tpu.parallel.sharded import (
    make_head_parallel_attention,
    make_parallel_attention,
)
from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import make_ulysses_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _qkv(key=0, b=2, h=8, s=256, d=64):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(kk, (b, h, s, d)) for kk in ks)


def _cos(a, b):
    return float(metrics.cosine_similarity(a, b))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    q, k, v = _qkv(0)
    k = k + 1.0  # exercise the global smooth-K mean psum
    mesh = make_mesh({"seq": 4})
    fn = make_ring_attention(mesh, is_causal=causal)
    o = fn(q, k, v)
    o_ref = attention_reference(q, k, v, is_causal=causal)
    assert _cos(o, o_ref) > 0.999


def test_ring_attention_lse():
    q, k, v = _qkv(1)
    mesh = make_mesh({"seq": 4})
    fn = make_ring_attention(mesh, return_lse=True)
    o, lse = fn(q, k, v)
    o_ref, lse_ref = attention_reference(q, k, v, return_lse=True)
    assert _cos(o, o_ref) > 0.999
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=5e-2, rtol=1e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_int8_wire(causal):
    """Ulysses with wire_bits=8: all-to-alls move int8 codes + scales (half
    the bf16 payload); result must track dense attention."""
    from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import make_ulysses_attention as mk
    q, k, v = _qkv(6)
    k = k + 0.5  # exercise the global smooth-K psum
    mesh = make_mesh({"seq": 4})
    fn = mk(mesh, wire_bits=8, is_causal=causal)
    o = fn(q, k, v)
    o_ref = attention_reference(q, k, v, is_causal=causal)
    assert _cos(o, o_ref) > 0.999


@pytest.mark.parametrize("causal", [False, True])
def test_ring_low_bandwidth_k4_v8(causal):
    """Low-ICI ring: packed int4 K codes + per-channel int8 V codes rotate
    (quarter + half the float payloads); must still track dense attention."""
    q, k, v = _qkv(5)
    mesh = make_mesh({"seq": 4})
    fn = make_ring_attention(mesh, is_causal=causal, k_bits=4, v_bits=8)
    o = fn(q, k, v)
    o_ref = attention_reference(q, k, v, is_causal=causal)
    assert _cos(o, o_ref) > 0.99  # int4-K noise floor (see PERFORMANCE.md)


def test_ring_degree_8():
    q, k, v = _qkv(2, s=512)
    mesh = make_mesh({"seq": 8})
    fn = make_ring_attention(mesh, is_causal=True)
    assert _cos(fn(q, k, v), attention_reference(q, k, v, is_causal=True)) > 0.999


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_matches_dense(causal):
    q, k, v = _qkv(3)
    mesh = make_mesh({"seq": 4})
    fn = make_ulysses_attention(mesh, is_causal=causal)
    assert _cos(fn(q, k, v), attention_reference(q, k, v, is_causal=causal)) > 0.999


def test_head_parallel_matches_dense():
    q, k, v = _qkv(4)
    mesh = make_mesh({"data": 2, "model": 4})
    fn = make_head_parallel_attention(mesh)
    assert _cos(fn(q, k, v), attention_reference(q, k, v)) > 0.999


@pytest.mark.parametrize("strategy", ["ulysses", "ring"])
def test_combined_3d_mesh(strategy):
    """data x model x seq all active at once (2x2x2)."""
    q, k, v = _qkv(5)
    mesh = make_mesh({"data": 2, "seq": 2, "model": 2})
    fn = make_parallel_attention(mesh, seq_strategy=strategy)
    assert _cos(fn(q, k, v), attention_reference(q, k, v)) > 0.999


def test_ring_int8_payload_halves_ici_bytes():
    """The rotating payload is int8 codes + f32 scale rows, not bf16/f32
    tensors — check the compiled collective operand dtypes."""
    q, k, v = _qkv(6, b=1, h=2, s=256)
    mesh = make_mesh({"seq": 4})
    fn = make_ring_attention(mesh)
    txt = jax.jit(fn).lower(q, k, v).compile().as_text()
    assert "collective-permute" in txt
    # at least one permute moves s8 data
    assert any("s8" in line for line in txt.splitlines() if "collective-permute" in line), (
        "expected an int8 collective-permute"
    )


@pytest.mark.parametrize("lengths", [[512, 512], [400, 130]])
def test_context_sharded_decode(lengths):
    """One sequence's KV cache sharded across 4 chips; psum LSE merge must
    match single-device decode (incl. shards left empty by short lengths)."""
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8
    from lowbit_quant_fa2_paddle_tpu.parallel.serving import (
        make_context_sharded_decode,
    )

    b, h, hk, s, d = 2, 8, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array(lengths, jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")

    o_single = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc)

    mesh = make_mesh({"seq": 4})
    fn = make_context_sharded_decode(mesh, block_kv=128)
    o_sharded = fn(q, kc, vc, ksc, lengths, vsc)
    np.testing.assert_allclose(
        np.asarray(o_sharded), np.asarray(o_single), atol=2e-5, rtol=1e-4
    )


def test_head_sharded_decode():
    """TP decode: head shards decode independently; equals single-device."""
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8
    from lowbit_quant_fa2_paddle_tpu.parallel.serving import (
        make_head_sharded_decode,
    )

    b, h, hk, s, d = 2, 8, 4, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array([256, 200], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")

    o_single = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc)
    mesh = make_mesh({"model": 4})
    fn = make_head_sharded_decode(mesh)
    o_tp = fn(q, kc, vc, ksc, lengths, vsc)
    np.testing.assert_allclose(
        np.asarray(o_tp), np.asarray(o_single), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("causal", [False, True])
def test_ring_k_space_matches_q_space(causal):
    # The K-major ring (default) and the Q-major ring run the same quant
    # codes and merge algebra — outputs must agree to accumulation order.
    q, k, v = _qkv(5)
    mesh = make_mesh({"seq": 4})
    ok = make_ring_attention(mesh, is_causal=causal, kernel_space="k")(q, k, v)
    oq = make_ring_attention(mesh, is_causal=causal, kernel_space="q")(q, k, v)
    assert _cos(ok, oq) > 0.9999


def test_ulysses_wire_k_space_matches_q_space():
    q, k, v = _qkv(6)
    mesh = make_mesh({"seq": 4})
    ok = make_ulysses_attention(mesh, wire_bits=8, kernel_space="k")(q, k, v)
    oq = make_ulysses_attention(mesh, wire_bits=8, kernel_space="q")(q, k, v)
    assert _cos(ok, oq) > 0.9999
    o_ref = attention_reference(q, k, v)
    assert _cos(ok, o_ref) > 0.999
