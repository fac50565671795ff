"""Sliding-window (local causal) attention — banded block-skip grid.

Oracle-checked over both kernel schedules, the quantized wrappers, GQA,
varlen segments, LSE, and non-block-multiple shapes. Beyond the reference
(its kernels have no local-attention mode); semantics match Mistral-class
sliding windows: q attends keys in (q - W, q].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowbit_quant_fa2_paddle_tpu as lq
from lowbit_quant_fa2_paddle_tpu.ops.attention import (
    _tri_schedule,
    flash_attention_fp,
)
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _qkv(b=1, h=2, s=1024, d=64, hk=None, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    hk = hk or h
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hk, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hk, s, d), jnp.float32)
    return q, k, v


def _cos(o, ref):
    return float(cosine_similarity(o.astype(jnp.float32), ref))


# ---------------------------------------------------------------------------
# Schedule-table invariants (pure host logic)
# ---------------------------------------------------------------------------


def test_band_schedule_tables():
    # Full causal: same triangular count as before, first flag iff j == 0.
    i_t, j_t, f_t, n = _tri_schedule(4, 4, 256, 256, 0)
    i_t, j_t, f_t = np.asarray(i_t), np.asarray(j_t), np.asarray(f_t)
    assert n == 4 + 3 + 2 + 1 + 0 + (0)  # qi row qi+1 blocks: 1+2+3+4 = 10
    assert n == 10
    assert all((f & 2) != 0 for f, j in zip(f_t, j_t) if j == 0)
    # Banded: rows beyond the window skip leading blocks entirely.
    i_b, j_b, f_b, nb = _tri_schedule(4, 4, 256, 256, 256)
    i_b, j_b, f_b = np.asarray(i_b), np.asarray(j_b), np.asarray(f_b)
    assert nb < n
    for qi in range(4):
        js = j_b[i_b == qi]
        fs = f_b[i_b == qi]
        # Lowest key attended by row qi: qi*256 - 255 -> block (qi*256-255)//256
        assert js[0] == max(0, (qi * 256 - 255) // 256)
        assert js[-1] == qi
        assert (fs[0] & 2) != 0 and (fs[-1] & 1) != 0
        assert all((f & 2) == 0 for f in fs[1:])
        assert all((f & 1) == 0 for f in fs[:-1])
    # window=1 (attend self only): exactly the diagonal blocks survive.
    i_s, j_s, _, ns = _tri_schedule(8, 8, 128, 128, 1)
    assert ns == 8 and all(np.asarray(i_s) == np.asarray(j_s))


# ---------------------------------------------------------------------------
# Kernel vs oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("schedule", ["k", "q"])
@pytest.mark.parametrize(
    "s,w,bq,bk",
    [
        (1024, 256, 256, 256),  # band skips blocks
        (1000, 100, 256, 128),  # non-block-multiple length + small window
        (512, 1, 128, 128),     # degenerate: attend self only
        (768, 2000, 256, 256),  # window >= seq: plain causal
    ],
)
def test_fp_window_vs_oracle(schedule, s, w, bq, bk):
    q, k, v = _qkv(s=s)
    ref = attention_reference(q, k, v, is_causal=True, window_size=w)
    o = flash_attention_fp(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        is_causal=True, window_size=w, schedule=schedule, block_q=bq, block_kv=bk,
    )
    assert _cos(o, ref) > 0.999


def test_window_matches_full_causal_when_large():
    q, k, v = _qkv(s=640)
    a = flash_attention_fp(q, k, v, is_causal=True, window_size=10_000,
                           block_q=256, block_kv=256)
    b = flash_attention_fp(q, k, v, is_causal=True, block_q=256, block_kv=256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


@pytest.mark.parametrize("bits", ["fp", "auto", "int8", "int8_v8", "int4", "int2"])
@pytest.mark.parametrize("sink", [0, 64])
def test_quantized_window_vs_oracle(bits, sink):
    """Every bits mode honors window AND sink (a swallowed-kwarg regression
    here once silently dropped sink_size in the non-int8 wrappers)."""
    q, k, v = _qkv(s=1024)
    ref = attention_reference(
        q, k, v, is_causal=True, window_size=320, sink_size=sink
    )
    o = lq.lowbit_fa_attn(
        q, k, v, bits=bits, is_causal=True, window_size=320, sink_size=sink
    )
    # "auto" may pick any branch incl. int4 (gaussian data has small scales)
    floor = {"fp": 0.999, "auto": 0.98, "int8": 0.999, "int8_v8": 0.998,
             "int4": 0.98, "int2": 0.85}[bits]
    assert _cos(o, ref) > floor
    if sink:
        # ...and the sink actually changes the output (kwarg not swallowed)
        o_ns = lq.lowbit_fa_attn(
            q, k, v, bits=bits, is_causal=True, window_size=320
        )
        assert not np.allclose(np.asarray(o), np.asarray(o_ns))


def test_window_gqa():
    q, k, v = _qkv(h=8, hk=2, s=512)
    ref = attention_reference(q, k, v, is_causal=True, window_size=200)
    o = lq.lowbit_fa_qk_int8_pv_fp16(q, k, v, is_causal=True, window_size=200)
    assert _cos(o, ref) > 0.999


def test_window_lse():
    q, k, v = _qkv(s=512)
    ref, lse_ref = attention_reference(
        q, k, v, is_causal=True, window_size=128, return_lse=True
    )
    o, lse = lq.lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=True, window_size=128, return_lse=True
    )
    assert _cos(o, ref) > 0.999
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=0.02)


def test_window_varlen_api():
    """lowbit_fa_varlen honors window (packed positions == within-sequence
    distances for contiguous packing) — the public cu_seqlens surface."""
    t, h, d, w = 512, 4, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (t, h, d), jnp.float32)
    cu = jnp.asarray([0, 300, 512], jnp.int32)
    o = lq.lowbit_fa_varlen(q, k, v, cu, cu, is_causal=True, window_size=w)
    # oracle: per-sequence windowed causal
    seg = jnp.concatenate([jnp.zeros(300, jnp.int32), jnp.ones(212, jnp.int32)])[None]
    ref = attention_reference(
        jnp.swapaxes(q, 0, 1)[None], jnp.swapaxes(k, 0, 1)[None],
        jnp.swapaxes(v, 0, 1)[None],
        is_causal=True, window_size=w, q_segment_ids=seg, kv_segment_ids=seg,
    )
    assert _cos(jnp.swapaxes(o, 0, 1)[None], ref) > 0.999
    # window actually active (differs from full-causal varlen)
    o_full = lq.lowbit_fa_varlen(q, k, v, cu, cu, is_causal=True)
    assert not np.allclose(np.asarray(o), np.asarray(o_full))


def test_window_varlen_segments():
    # Packed segments [0]*300 + [1]*212; window applies within segments
    # (contiguous packing => packed distance == within-segment distance).
    s, w = 512, 64
    q, k, v = _qkv(s=s)
    seg = jnp.concatenate([jnp.zeros(300, jnp.int32), jnp.ones(212, jnp.int32)])
    seg = seg[None, :]
    ref = attention_reference(
        q, k, v, is_causal=True, window_size=w,
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention

    o = lowbit_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        is_causal=True, window_size=w,
        q_segment_ids=seg, kv_segment_ids=seg,
        block_q=128, block_kv=128,
    )
    assert _cos(o, ref) > 0.999


def test_ulysses_and_tp_windowed_match_dense():
    """window_size flows through the Ulysses and head-TP facades (after the
    Ulysses all-to-all each device holds the FULL sequence for its head
    subset, so global window positions are exact)."""
    from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
    from lowbit_quant_fa2_paddle_tpu.parallel.sharded import (
        make_head_parallel_attention,
    )
    from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import (
        make_ulysses_attention,
    )

    b, h, s, d, w = 1, 4, 512, 64, 100
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    ref = attention_reference(q, k, v, is_causal=True, window_size=w)

    mesh_u = make_mesh({"seq": 4})
    o_u = make_ulysses_attention(mesh_u, is_causal=True, window_size=w)(q, k, v)
    assert _cos(o_u, ref) > 0.999

    mesh_tp = make_mesh({"data": 1, "model": 4})
    o_tp = make_head_parallel_attention(
        mesh_tp, is_causal=True, window_size=w
    )(q, k, v)
    assert _cos(o_tp, ref) > 0.999


def test_ring_windowed_matches_dense_and_drops_hops():
    """Windowed ring attention over the 8-device CPU mesh: matches the
    dense windowed oracle, and the rotation stops after the window's hop
    count (verified by the jitted HLO containing fewer collective-permutes
    than the full ring)."""
    from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
    from lowbit_quant_fa2_paddle_tpu.parallel.ring import make_ring_attention

    b, h, s, d, w = 1, 2, 1024, 64, 200  # s_loc = 128 on an 8-ring
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32) + 1.0
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    mesh = make_mesh({"seq": 8})
    fn = make_ring_attention(mesh, is_causal=True, window_size=w)
    o = fn(q, k, v)
    ref = attention_reference(q, k, v, is_causal=True, window_size=w)
    assert _cos(o, ref) > 0.999
    # w=200, s_loc=128 -> hops = 2 + (200-2)//128 = 3 of 8; count ppermutes.
    full = make_ring_attention(mesh, is_causal=True)
    n_pp = str(jax.jit(fn).lower(q, k, v).compile().as_text()).count(
        "collective-permute"
    )
    n_pp_full = str(jax.jit(full).lower(q, k, v).compile().as_text()).count(
        "collective-permute"
    )
    assert n_pp < n_pp_full, (n_pp, n_pp_full)


def test_sink_prefill_vs_oracle():
    """StreamingLLM attention sinks: window + visible [0, sink) anchors."""
    q, k, v = _qkv(s=1024)
    ref = attention_reference(
        q, k, v, is_causal=True, window_size=200, sink_size=64
    )
    for sched in ("k", "q"):
        from lowbit_quant_fa2_paddle_tpu.ops.attention import (
            lowbit_attention,
            lowbit_attention_km,
        )

        if sched == "k":
            o = lowbit_attention_km(
                jnp.swapaxes(q, 2, 3).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                jnp.swapaxes(v, 2, 3).astype(jnp.bfloat16),
                is_causal=True, window_size=200, sink_size=64,
                block_q=256, block_kv=128,
            )
            o = jnp.swapaxes(o, 2, 3)
        else:
            o = lowbit_attention(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                is_causal=True, window_size=200, sink_size=64,
                block_q=256, block_kv=128,
            )
        assert _cos(o, ref) > 0.999, sched
    # int8 API path
    o8 = lq.lowbit_fa_qk_int8_pv_fp16(
        q, k, v, is_causal=True, window_size=200, sink_size=64
    )
    assert _cos(o8, ref) > 0.999


def test_sink_decode_vs_oracle():
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8

    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    b, h, hk, s, d, w, sk = 2, 8, 2, 512, 64, 100, 32
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array([512, 300], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    o = dec.decode_attention(
        q, kc, vc, ksc, lengths, v_scale=vsc,
        window_size=w, sink_size=sk, block_kv=64,
    )
    for i in range(b):
        L = int(lengths[i])
        lo = max(0, L - w)
        ki = jnp.concatenate([k[i : i + 1, :, :sk], k[i : i + 1, :, lo:L]], axis=2)
        vi = jnp.concatenate([v[i : i + 1, :, :sk], v[i : i + 1, :, lo:L]], axis=2)
        ref = attention_reference(q[i : i + 1].reshape(1, h, 1, d), ki, vi)
        c = _cos(o[i][None, :, None, :], ref)
        assert c > 0.999, (i, c)


def test_sink_llm_decode_matches_prefill():
    """Sinked+windowed LLM: decode via cache == prefill (same mask both
    phases), and differs from the window-only model."""
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.tiny_llm_config(max_seq=64, window_size=6, sink_size=4)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    logits, caches = llm.llm_prefill(params, prompt, cfg, attn_impl="exact")
    nxt = jnp.argmax(logits[:, -1], -1)
    lo_dec, _ = llm.llm_decode_step(params, nxt, caches, cfg)
    full = jnp.concatenate([prompt, nxt[:, None]], axis=1)
    lo_full, _ = llm.llm_prefill(params, full, cfg, attn_impl="exact")
    cos = jnp.sum(lo_dec * lo_full[:, -1]) / (
        jnp.linalg.norm(lo_dec) * jnp.linalg.norm(lo_full[:, -1])
    )
    assert float(cos) > 0.999
    cfg_nosink = llm.tiny_llm_config(max_seq=64, window_size=6)
    lo_ns, _ = llm.llm_prefill(params, full, cfg_nosink, attn_impl="exact")
    assert not np.allclose(np.asarray(lo_full), np.asarray(lo_ns))


@pytest.fixture(params=["native", "fallback"])
def sched_cls(request, monkeypatch):
    import lowbit_quant_fa2_paddle_tpu.host as host_mod
    from lowbit_quant_fa2_paddle_tpu.host import Scheduler

    if request.param == "native":
        if not host_mod.HAVE_NATIVE:
            pytest.skip("native extension not built")
    else:
        monkeypatch.setattr(host_mod, "_native", None)
    return Scheduler


def test_scheduler_trim(sched_cls):
    """Rolling-window page reclamation: trim frees leading logical pages,
    leaves -1 holes, protects [0, start), and release skips holes."""
    s = sched_cls(8, 4, 2)
    rid = s.add(10, 7)  # 3 content pages now, worst case 4
    s.step()
    assert s.stats()["free_pages"] == 5
    freed = s.trim(rid, 2, start=1)  # trim logical page 1 only
    assert freed == 1
    pt = s.page_table(rid)
    assert pt[1] == -1 and pt[0] >= 0 and pt[2] >= 0
    assert s.stats()["free_pages"] == 6
    # idempotent; start protects the sink page
    assert s.trim(rid, 2, start=1) == 0
    assert s.trim(rid, 1) == 1  # now the sink page too
    assert s.page_table(rid)[0] == -1
    # growth continues; release returns every remaining page
    for _ in range(4):
        assert s.append_token(rid) > 0
    s.release(rid)
    assert s.stats()["free_pages"] == 8


def test_serving_windowed_rolling_reclamation():
    """A windowed engine generates past what the page pool could EVER hold
    un-trimmed — rolling reclamation keeps per-sequence pages at
    O(sink + window) — and the tokens still match the contiguous-cache
    windowed oracle (trimmed pages are provably out of every future mask)."""
    from lowbit_quant_fa2_paddle_tpu.models import llm as L
    from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine

    cfg = L.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2,
        max_seq=256, window_size=16, sink_size=4,
    )
    params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = [7, 3, 22, 9, 41, 5, 16, 2]
    max_new = 80  # total 88 tokens = 11 pages of 8 — pool holds only 8
    ref = L.generate(params, jnp.asarray([prompt]), max_new, cfg)
    eng = ServingEngine(
        params, cfg,
        ServingConfig(page_size=8, num_pages=8, max_batch=1,
                      max_pages_per_seq=16),  # logical width > pool size
    )
    rid = eng.add_request(prompt, max_new)
    got = eng.run()[rid]
    assert got == list(np.asarray(ref[0])), (got[:10], np.asarray(ref[0])[:10])
    st = eng.stats()
    assert st["free_pages"] == st["num_pages"]  # everything returned


def test_serving_windowed_multi_step_token_identical():
    """Windowed engine + multi-step segments (r5): reclamation trims
    conservatively below each segment's FIRST position, so scanned steps
    never read a trimmed page — the stream matches the single-step
    windowed engine bit-for-bit on CPU, past what the pool could hold
    untrimmed, and every page returns."""
    from lowbit_quant_fa2_paddle_tpu.models import llm as L
    from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine

    cfg = L.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2,
        max_seq=256, window_size=16, sink_size=4,
    )
    params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = [7, 3, 22, 9, 41, 5, 16, 2]
    max_new = 80  # 11 pages of 8 untrimmed; pool holds 10
    eng1 = ServingEngine(
        params, cfg,
        ServingConfig(page_size=8, num_pages=10, max_batch=1,
                      max_pages_per_seq=16),
    )
    r1 = eng1.add_request(prompt, max_new)
    ref = eng1.run()[r1]
    engm = ServingEngine(
        params, cfg,
        ServingConfig(page_size=8, num_pages=10, max_batch=1,
                      max_pages_per_seq=16, multi_step=4),
    )
    rm = engm.add_request(prompt, max_new)
    got = engm.run()[rm]
    assert engm.multi_segments > 0
    assert got == ref, (got[:10], ref[:10])
    st = engm.stats()
    assert st["free_pages"] == st["num_pages"]


def test_window_requires_causal():
    q, k, v = _qkv(s=256)
    with pytest.raises(AssertionError):
        flash_attention_fp(q, k, v, is_causal=False, window_size=64)


# ---------------------------------------------------------------------------
# Windowed decode (rolling KV window over the quantized cache)
# ---------------------------------------------------------------------------


def _decode_ref_windowed(q, k, v, lengths, w):
    b, h, d = q.shape
    outs = []
    for i in range(b):
        L = int(lengths[i])
        lo = max(0, L - w)
        o = attention_reference(
            q[i : i + 1].reshape(1, h, 1, d),
            k[i : i + 1, :, lo:L],
            v[i : i + 1, :, lo:L],
        )
        outs.append(o[:, :, 0])
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("lengths,w", [([512, 512], 128), ([300, 170], 200)])
def test_decode_window_contiguous(lengths, w):
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    b, h, hk, s, d = 2, 8, 2, 512, 64
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array(lengths, jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    o = dec.decode_attention(
        q, kc, vc, ksc, lengths, v_scale=vsc, window_size=w, block_kv=128
    )
    ref = _decode_ref_windowed(q, k, v, lengths, w)
    assert _cos(o, ref) > 0.999


def test_decode_window_paged():
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8

    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    b, h, hk, s, d, page = 2, 4, 2, 512, 64, 128
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array([512, 384], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    # Build a shuffled paged layout: logical page p of seq i -> physical pid.
    n_log = s // page
    perm = np.random.RandomState(0).permutation(b * n_log)
    table = perm.reshape(b, n_log).astype(np.int32)
    kp = np.zeros((hk, b * n_log, page, d), np.int8)
    vp = np.zeros((hk, b * n_log, page, d), np.int8)
    ksp = np.zeros((hk, b * n_log, page), np.float32)
    vsp = np.zeros((hk, b * n_log, page), np.float32)
    for i in range(b):
        for p in range(n_log):
            pid = table[i, p]
            rows = slice(p * page, (p + 1) * page)
            kp[:, pid] = np.asarray(kc)[i, :, rows]
            vp[:, pid] = np.asarray(vc)[i, :, rows]
            ksp[:, pid] = np.asarray(ksc)[i, :, rows]
            vsp[:, pid] = np.asarray(vsc)[i, :, rows]
    o = dec.decode_attention(
        q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(ksp), lengths,
        v_scale=jnp.asarray(vsp), page_table=jnp.asarray(table),
        window_size=150,
    )
    ref = _decode_ref_windowed(q, k, v, lengths, 150)
    assert _cos(o, ref) > 0.999


def test_llm_windowed_decode_matches_windowed_prefill():
    """Sliding-window LLM: decoding token s+1 via the rolling-window cache
    must match prefilling s+1 tokens through the banded prefill kernel —
    the same window semantics at both phases."""
    from lowbit_quant_fa2_paddle_tpu.models import llm

    cfg = llm.tiny_llm_config(max_seq=64, window_size=8)
    params = llm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab)
    logits, caches = llm.llm_prefill(params, prompt, cfg, attn_impl="exact")
    nxt = jnp.argmax(logits[:, -1], -1)
    lo_dec, _ = llm.llm_decode_step(params, nxt, caches, cfg)
    full = jnp.concatenate([prompt, nxt[:, None]], axis=1)
    lo_full, _ = llm.llm_prefill(params, full, cfg, attn_impl="exact")
    cos = jnp.sum(lo_dec * lo_full[:, -1]) / (
        jnp.linalg.norm(lo_dec) * jnp.linalg.norm(lo_full[:, -1])
    )
    assert float(cos) > 0.999
    # ...and differs from the un-windowed model (the window is active).
    cfg_full = llm.tiny_llm_config(max_seq=64)
    lo_nf, _ = llm.llm_prefill(params, full, cfg_full, attn_impl="exact")
    assert not np.allclose(np.asarray(lo_full), np.asarray(lo_nf))


def test_window_training_grads_match_oracle():
    """Windowed trainable attention: grads vs autodiff of the exact oracle
    with the same band mask (fwd + bwd must agree on the window)."""
    from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
        flash_attention_trainable,
    )

    q, k, v = _qkv(s=512, h=4)
    w = 96

    def loss_kernel(q, k, v):
        o = flash_attention_trainable(q, k, v, True, None, 128, 128, w)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, is_causal=True, window_size=w)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk_ = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr_ = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk_, gr_):
        assert _cos(a, b) > 0.9999


def test_serving_windowed_matches_contiguous_generate():
    """Sliding-window serving engine == the contiguous-cache windowed
    oracle (models.llm.generate with the same cfg) — window semantics agree
    across the paged serving decode and the plain decode path."""
    from lowbit_quant_fa2_paddle_tpu.models import llm as L
    from lowbit_quant_fa2_paddle_tpu.serving import ServingConfig, ServingEngine

    cfg = L.tiny_llm_config(
        vocab=64, dim=64, depth=2, num_heads=4, num_kv_heads=2,
        max_seq=64, window_size=6,
    )
    params = L.init_llm_params(jax.random.PRNGKey(0), cfg)
    prompt, max_new = [5, 11, 3, 7, 2, 9, 14, 1], 6
    ref = L.generate(params, jnp.asarray([prompt]), max_new, cfg)
    eng = ServingEngine(
        params, cfg, ServingConfig(page_size=8, num_pages=16, max_batch=2)
    )
    assert eng.prefix_cache is None  # windowed models disable prefix cache
    rid = eng.add_request(prompt, max_new)
    got = eng.run()[rid]
    assert got == list(np.asarray(ref[0])), (got, np.asarray(ref[0]))


def test_decode_window_noop_when_large():
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    b, h, hk, s, d = 1, 4, 2, 256, 64
    q = jax.random.normal(ks[0], (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array([256], jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    a = dec.decode_attention(q, kc, v.astype(jnp.bfloat16), ksc, lengths,
                             window_size=10_000, block_kv=128)
    full = dec.decode_attention(q, kc, v.astype(jnp.bfloat16), ksc, lengths,
                                block_kv=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(full), rtol=0, atol=0)


@pytest.mark.parametrize("qt", [1, 3])
@pytest.mark.parametrize(
    "lengths,w,sink",
    [
        ([512, 512], 128, 0),   # deep cache, plain window
        ([300, 170], 200, 0),   # one sequence shorter than the window
        ([512, 450], 96, 40),   # sink smaller than a page
        ([512, 300], 128, 128), # sink exactly one page
    ],
)
def test_decode_window_compaction_bit_identical(lengths, w, sink, qt):
    """The compacted banded page walk must be bit-identical to the dead-step
    walk (it changes the grid, never the math) — including short sequences,
    partial-page sinks, and multi-token (speculative-verify) queries."""
    from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
    from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int8

    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    b, h, hk, s, d = 2, 8, 2, 512, 64
    q = jax.random.normal(ks[0], (b, qt, h, d) if qt > 1 else (b, h, d))
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = jnp.array(lengths, jnp.int32)
    kc, ksc = quant_int8(k, gran="per_token")
    vc, vsc = quant_int8(v, gran="per_token")
    kw = dict(v_scale=vsc, window_size=w, sink_size=sink, block_kv=64)
    o_c = dec.decode_attention(q, kc, vc, ksc, lengths, **kw)
    o_d = dec.decode_attention(
        q, kc, vc, ksc, lengths, compact_window=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(o_c), np.asarray(o_d))
