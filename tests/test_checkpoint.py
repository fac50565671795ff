"""Checkpoint utilities: params round-trip, packed quantized-cache round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import dit
from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.utils import checkpoint as ckpt


def test_params_roundtrip(tmp_path):
    cfg = dit.tiny_config(depth=2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    ckpt.save_params(path, params)
    restored = ckpt.load_params(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_quantized_cache_roundtrip_packed(tmp_path):
    cache = dec.init_kv_cache(2, 2, 32, 64)
    # int4-range codes -> packed path
    key = jax.random.PRNGKey(1)
    cache["k"] = jax.random.randint(key, cache["k"].shape, -7, 8, jnp.int8)
    cache["v"] = jax.random.randint(jax.random.fold_in(key, 1), cache["v"].shape, -7, 8, jnp.int8)
    cache["k_scale"] = jax.random.uniform(jax.random.fold_in(key, 2), cache["k_scale"].shape)
    cache["length"] = jnp.array([5, 9], jnp.int32)
    path = str(tmp_path / "cache.npz")
    ckpt.save_quantized_cache(path, cache)
    # packed on disk: k blob should be half the code bytes
    data = np.load(path)
    assert data["k"].size == cache["k"].size // 2
    restored = ckpt.load_quantized_cache(path)
    for name in ("k", "v", "k_scale", "v_scale", "length"):
        np.testing.assert_array_equal(np.asarray(cache[name]), np.asarray(restored[name]))


def test_quantized_cache_roundtrip_int8(tmp_path):
    cache = dec.init_kv_cache(1, 1, 16, 32)
    cache["k"] = jax.random.randint(jax.random.PRNGKey(2), cache["k"].shape, -127, 128, jnp.int8)
    path = str(tmp_path / "cache8.npz")
    ckpt.save_quantized_cache(path, cache)
    restored = ckpt.load_quantized_cache(path)
    np.testing.assert_array_equal(np.asarray(cache["k"]), np.asarray(restored["k"]))
