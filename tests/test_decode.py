"""Decode attention + quantized KV cache tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops import metrics
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int4, quant_int8
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _setup(key=0, b=2, h=8, hk=2, s=512, d=64):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    return q, k, v


def _dense_ref(q, k, v, lengths, logit_cap=None):
    """Decode == dense attention with Sq=1 per sequence, masked to length."""
    b, h, d = q.shape
    hk = k.shape[1]
    outs = []
    for i in range(b):
        L = int(lengths[i])
        o = attention_reference(
            q[i : i + 1].reshape(1, h, 1, d),
            k[i : i + 1, :, :L],
            v[i : i + 1, :, :L],
            logit_cap=logit_cap,
        )
        outs.append(o[:, :, 0])
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("lengths", [[512, 512], [300, 170]])
def test_decode_contiguous_int8k_fpv(lengths):
    q, k, v = _setup(0)
    lengths = jnp.array(lengths, jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    o = dec.decode_attention(q, kc, v.astype(jnp.bfloat16), ksc, lengths)
    o_ref = _dense_ref(q, k, v, lengths)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


def test_decode_int8_kv():
    q, k, v = _setup(1)
    lengths = jnp.array([512, 400], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    o = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc)
    o_ref = _dense_ref(q, k, v, lengths)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


def test_decode_int4_kv():
    """int4 nibble-packed K and V caches (halved decode stream bytes)."""
    q, k, v = _setup(7)
    lengths = jnp.array([512, 400], jnp.int32)
    kc, ksc = quant_int4(k, gran="per_token")
    vc, vsc = quant_int4(v, gran="per_token")
    o = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc, kv_bits=4)
    o_ref = _dense_ref(q, k, v, lengths)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.985


def test_decode_mixed_k4_v8():
    """KIVI-style mixed config: int4 K (logit noise is softmax-smoothed) +
    int8 V (value noise lands directly in the output)."""
    q, k, v = _setup(10)
    lengths = jnp.array([512, 400], jnp.int32)
    kc, ksc = quant_int4(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    o = dec.decode_attention(
        q, kc, vc, ksc, lengths, v_scale=vsc, k_bits=4, v_bits=8
    )
    o_ref = _dense_ref(q, k, v, lengths)
    # int4-K noise dominates (matches the prefill int4-K record, ~0.994);
    # int8 V adds ~nothing on top.
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.99


def test_decode_int4_paged():
    """Paged int4 cache matches the contiguous int4 result exactly."""
    b, h, hk, s, d, page = 2, 8, 2, 512, 64, 256
    q, k, v = _setup(8, b=b, h=h, hk=hk, s=s, d=d)
    lengths = jnp.array([512, 300], jnp.int32)
    kc, ksc = quant_int4(k, gran="per_token")
    vc, vsc = quant_int4(v, gran="per_token")
    o_contig = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc, kv_bits=4)

    n_log = s // page
    np_total = b * n_log
    dc = d // 2
    perm = np.random.RandomState(1).permutation(np_total)
    k_pool = np.zeros((hk, np_total, page, dc), np.int8)
    v_pool = np.zeros((hk, np_total, page, dc), np.int8)
    ks_pool = np.zeros((hk, np_total, page), np.float32)
    vs_pool = np.zeros((hk, np_total, page), np.float32)
    table = np.zeros((b, n_log), np.int32)
    kc_n, vc_n = np.asarray(kc), np.asarray(vc)
    ks_n, vs_n = np.asarray(ksc), np.asarray(vsc)
    for bi in range(b):
        for pi in range(n_log):
            phys = int(perm[bi * n_log + pi])
            table[bi, pi] = phys
            sl = slice(pi * page, (pi + 1) * page)
            k_pool[:, phys] = kc_n[bi, :, sl]
            v_pool[:, phys] = vc_n[bi, :, sl]
            ks_pool[:, phys] = ks_n[bi, :, sl]
            vs_pool[:, phys] = vs_n[bi, :, sl]
    o_paged = dec.decode_attention(
        q, jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(ks_pool),
        lengths, v_scale=jnp.asarray(vs_pool), page_table=jnp.asarray(table),
        block_kv=page, kv_bits=4,
    )
    np.testing.assert_allclose(
        np.asarray(o_paged), np.asarray(o_contig), atol=1e-5, rtol=1e-4
    )


def test_kv_cache_int4_append_and_decode():
    """Streaming int4 cache: packed append + decode matches dense."""
    b, h, hk, d, s_max = 1, 4, 2, 32, 64
    cache = dec.init_kv_cache(b, hk, s_max, d, bits=4)
    assert cache["k"].shape[-1] == d // 2
    key = jax.random.PRNGKey(9)
    ks_all = jax.random.normal(key, (10, b, hk, d))
    vs_all = jax.random.normal(jax.random.fold_in(key, 1), (10, b, hk, d))
    append = jax.jit(dec.append_kv)
    for t in range(10):
        cache = append(cache, ks_all[t], vs_all[t])
    q = jax.random.normal(jax.random.fold_in(key, 2), (b, h, d))
    o = dec.decode_attention(
        q, cache["k"], cache["v"], cache["k_scale"], cache["length"],
        v_scale=cache["v_scale"], kv_bits=4,
    )
    k_dense = jnp.swapaxes(ks_all[:, 0], 0, 1)[None]
    v_dense = jnp.swapaxes(vs_all[:, 0], 0, 1)[None]
    o_ref = _dense_ref(q, k_dense, v_dense, jnp.array([10]))
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.985


def test_decode_mqa_and_logit_cap():
    q, k, v = _setup(2, h=8, hk=1)
    lengths = jnp.array([512, 512], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    o = dec.decode_attention(
        q, kc, v.astype(jnp.bfloat16), ksc, lengths, logit_cap=5.0
    )
    o_ref = _dense_ref(q, k, v, lengths, logit_cap=5.0)
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


def test_decode_paged_matches_contiguous():
    """Paged cache with shuffled physical pages == contiguous result."""
    b, h, hk, s, d, page = 2, 8, 2, 512, 64, 256
    q, k, v = _setup(3, b=b, h=h, hk=hk, s=s, d=d)
    lengths = jnp.array([512, 300], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    o_contig = dec.decode_attention(q, kc, vc, ksc, lengths, v_scale=vsc)

    # Scatter logical pages into shuffled physical slots (shared pool: pages
    # for all sequences live in one [Hk, Np, page, D] pool; here each (b)
    # keeps its own kv-heads, so fold b into the head dim of the pool).
    n_log = s // page
    np_total = b * n_log
    perm = np.random.RandomState(0).permutation(np_total)
    k_pool = np.zeros((hk, np_total, page, d), np.int8)
    v_pool = np.zeros((hk, np_total, page, d), np.int8)
    ks_pool = np.zeros((hk, np_total, page), np.float32)
    vs_pool = np.zeros((hk, np_total, page), np.float32)
    table = np.zeros((b, n_log), np.int32)
    kc_n, vc_n = np.asarray(kc), np.asarray(vc)
    ks_n, vs_n = np.asarray(ksc), np.asarray(vsc)
    for bi in range(b):
        for pi in range(n_log):
            phys = int(perm[bi * n_log + pi])
            table[bi, pi] = phys
            sl = slice(pi * page, (pi + 1) * page)
            k_pool[:, phys] = kc_n[bi, :, sl]
            v_pool[:, phys] = vc_n[bi, :, sl]
            ks_pool[:, phys] = ks_n[bi, :, sl]
            vs_pool[:, phys] = vs_n[bi, :, sl]

    # NOTE: per-b KV heads sharing one pool requires distinct pages per b;
    # decode_attention's paged form indexes pool by (h, page): since both
    # sequences share hk head slots, give each b its own pages (done above).
    o_paged = dec.decode_attention(
        q,
        jnp.asarray(k_pool),
        jnp.asarray(v_pool),
        jnp.asarray(ks_pool),
        lengths,
        v_scale=jnp.asarray(vs_pool),
        page_table=jnp.asarray(table),
        block_kv=page,
    )
    np.testing.assert_allclose(
        np.asarray(o_paged), np.asarray(o_contig), atol=1e-5, rtol=1e-4
    )


def test_kv_cache_append_and_decode():
    """Streaming: append tokens one at a time, then decode — matches dense."""
    b, h, hk, d, s_max = 1, 4, 2, 32, 64
    cache = dec.init_kv_cache(b, hk, s_max, d)
    key = jax.random.PRNGKey(4)
    ks_all = jax.random.normal(key, (10, b, hk, d))
    vs_all = jax.random.normal(jax.random.fold_in(key, 1), (10, b, hk, d))
    append = jax.jit(dec.append_kv)
    for t in range(10):
        cache = append(cache, ks_all[t], vs_all[t])
    assert int(cache["length"][0]) == 10
    q = jax.random.normal(jax.random.fold_in(key, 2), (b, h, d))
    o = dec.decode_attention(
        q, cache["k"], cache["v"], cache["k_scale"], cache["length"],
        v_scale=cache["v_scale"],
    )
    k_dense = jnp.swapaxes(ks_all[:, 0], 0, 1)[None]  # [1,Hk,10,D]
    v_dense = jnp.swapaxes(vs_all[:, 0], 0, 1)[None]
    o_ref = _dense_ref(q, k_dense, v_dense, jnp.array([10]))
    assert float(metrics.cosine_similarity(o, o_ref)) > 0.999


@pytest.mark.parametrize(
    "qt,lengths,w,sink",
    [
        (1, [512, 509], None, 0),   # plain decode, one unaligned length
        (1, [512, 300], 128, 32),   # compacted windowed walk + sink
        (4, [512, 450], 200, 0),    # multi-token verify + window
    ],
)
def test_decode_fast_interior_matches_masked(qt, lengths, w, sink):
    """The interior-page fast path (unmasked compute on fully-visible grid
    steps, default-off A/B probe) matches the always-masked chain. On TPU
    Mosaic the two are bit-identical (measured maxdiff 0.0); CPU XLA fuses
    the two programs differently, so interpret mode tolerates ~ulp drift."""
    b, h, hk, s, d = 2, 8, 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q = jax.random.normal(ks[0], (b, qt, h, d) if qt > 1 else (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    kw = dict(v_scale=vsc, window_size=w, sink_size=sink, block_kv=64)
    L = jnp.array(lengths, jnp.int32)
    a = dec.decode_attention(q, kc, vc, ksc, L, fast_interior=True, **kw)
    m = dec.decode_attention(q, kc, vc, ksc, L, fast_interior=False, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(m), rtol=0, atol=1e-6)
    # The uncompacted windowed walk's fast predicate must mark the SAME
    # pages as the compacted walk's, or the compaction bit-identity
    # contract breaks when the probe is on.
    if w:
        nc = dec.decode_attention(
            q, kc, vc, ksc, L, fast_interior=True, compact_window=False, **kw
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(nc))
