"""Durable block-size tuning cache (utils/tuning.py) + launcher wiring."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops
from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention_km
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference
from lowbit_quant_fa2_paddle_tpu.utils import tuning


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    path = str(tmp_path / "tuning.json")
    monkeypatch.setenv("LOWBIT_FA_TUNING_CACHE", path)
    tuning.clear_memory_cache()
    yield path
    tuning.clear_memory_cache()


def test_record_lookup_roundtrip(tmp_cache):
    assert tuning.lookup("km", 64, 4096, False, device="v5e") is None
    p = tuning.record("km", 64, 4096, False, 2048, 512, 88.6, device="v5e")
    assert p == tmp_cache
    assert tuning.lookup("km", 64, 4096, False, device="v5e") == (2048, 512)
    # distinct keys: causal flag, seq, device
    assert tuning.lookup("km", 64, 4096, True, device="v5e") is None
    assert tuning.lookup("km", 64, 8192, False, device="v5e") is None
    assert tuning.lookup("km", 64, 4096, False, device="other") is None
    # survives a fresh in-process load
    tuning.clear_memory_cache()
    assert tuning.lookup("km", 64, 4096, False, device="v5e") == (2048, 512)
    with open(tmp_cache) as f:
        raw = json.load(f)
    assert list(raw.values())[0]["tflops"] == 88.6


def test_bundled_defaults_layer(tmp_cache, monkeypatch):
    # A bundled entry is visible with no user cache...
    bundled = {
        "v5e|km|d64|s1234|c0": {"block_q": 1024, "block_kv": 256, "tflops": 1.0}
    }
    import lowbit_quant_fa2_paddle_tpu.utils.tuning as t

    bp = tmp_cache + ".bundled"
    with open(bp, "w") as f:
        json.dump(bundled, f)
    monkeypatch.setattr(t, "_bundled_path", lambda: bp)
    tuning.clear_memory_cache()
    assert tuning.lookup("km", 64, 1234, False, device="v5e") == (1024, 256)
    # ...the user cache overrides it entry-by-entry...
    tuning.record("km", 64, 1234, False, 512, 512, 2.0, device="v5e")
    assert tuning.lookup("km", 64, 1234, False, device="v5e") == (512, 512)
    # ...and the user cache FILE never absorbs bundled entries.
    tuning.record("km", 64, 9999, False, 256, 256, 3.0, device="v5e")
    with open(tmp_cache) as f:
        raw = json.load(f)
    assert set(raw) == {"v5e|km|d64|s1234|c0", "v5e|km|d64|s9999|c0"}
    # bundled entry still wins for keys the user never recorded
    tuning.clear_memory_cache()
    assert tuning.lookup("km", 64, 1234, False, device="v5e") == (512, 512)


def test_corrupt_cache_never_raises(tmp_cache):
    with open(tmp_cache, "w") as f:
        f.write("{not json")
    tuning.clear_memory_cache()
    assert tuning.lookup("km", 64, 512, False) is None
    # and record still works (overwrites the corrupt file)
    tuning.record("km", 64, 512, False, 256, 256)
    assert tuning.lookup("km", 64, 512, False) == (256, 256)


def test_launcher_uses_tuned_blocks(tmp_cache):
    # Record blocks for THIS device kind and shape; the kernel must still be
    # exact (any legal block shape is semantically identical), proving the
    # cache path at least doesn't corrupt results; the pick itself is probed
    # via the recorded device-kind key being the one the launcher builds.
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    b, h, s, d = 1, 2, 512, 64
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    qT, qs = q_ops.quant_int8(q, gran="per_token", layout="ds")
    kc, ksc = q_ops.quant_int8(k, gran="per_token")
    tuning.record("km", d, s, False, 256, 128)
    o = lowbit_attention_km(qT, kc, jnp.swapaxes(v, 2, 3), qs, ksc)
    ref = attention_reference(q, k, v)
    assert float(cosine_similarity(jnp.swapaxes(o, 2, 3).astype(jnp.float32), ref)) > 0.999
    # the entry the launcher looked up is the one we wrote (same key fn)
    assert tuning.lookup("km", d, s, False) == (256, 128)


def test_decode_space_entry_consulted(tmp_cache):
    """A decode-space tuning entry (block_kv + heads_per_step, pow2 context
    bucket) must steer decode_attention when both knobs are left unset —
    checked by bit-identity against the same knobs passed explicitly."""
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec

    assert tuning.pow2_bucket(131072) == 131072
    assert tuning.pow2_bucket(133120) == 131072  # 128K + slack stays 128K
    assert tuning.pow2_bucket(200000) == 262144
    assert tuning.pow2_bucket(1) == 1
    tuning.record("decode_k8v8", 64, tuning.pow2_bucket(512), False, 0, 128,
                  extra={"heads_per_step": 2})
    ent = tuning.lookup_entry("decode_k8v8", 64, 512, False)
    assert ent["block_kv"] == 128 and ent["heads_per_step"] == 2

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    b, h, hk, s, d = 2, 8, 2, 512, 64
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.bfloat16)
    kq, ksx = dec.quantize_token(k, bits=8)
    vq, vsx = dec.quantize_token(v, bits=8)
    lengths = jnp.full((b,), s, jnp.int32)
    o_auto = dec.decode_attention(q, kq, vq, ksx, lengths, v_scale=vsx)
    o_expl = dec.decode_attention(q, kq, vq, ksx, lengths, v_scale=vsx,
                                  block_kv=128, heads_per_step=2)
    np.testing.assert_array_equal(np.asarray(o_auto), np.asarray(o_expl))


def test_gemv_space_entry_consulted(tmp_cache):
    """A gemv-space entry steers wq_matmul_per_channel's N tile when
    block_n is unset (result invariant to the tile — bit-identity)."""
    from lowbit_quant_fa2_paddle_tpu.ops import gemv

    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    m, n, k = 4, 512, 256
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    w = jax.random.normal(ks[1], (n, k), jnp.float32)
    packed, scale = gemv.pack_weights_per_channel(w, bits=8)
    tuning.record("gemv_w8", k, tuning.pow2_bucket(n), False, 0, 256)
    o_auto = gemv.wq_matmul_per_channel(x, packed, scale, bits=8)
    o_expl = gemv.wq_matmul_per_channel(x, packed, scale, bits=8, block_n=256)
    np.testing.assert_array_equal(np.asarray(o_auto), np.asarray(o_expl))
