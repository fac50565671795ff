"""Seeded cross-flag fuzz for the decode kernel (ops/decode.py).

The decode kernel's knob space grew in round 3 (window, sink anchors,
multi-token q_tokens, paged tables, heads_per_step, compute_mode,
mixed K/V bits); targeted tests cover each knob — this sweep samples the
interaction space against the sliced-cache fp32 oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu.ops import decode as dec
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity
from lowbit_quant_fa2_paddle_tpu.ops.quant import quant_int4, quant_int8
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference


def _sample(seed):
    r = random.Random(1000 + seed)
    h = r.choice([4, 8])
    return dict(
        b=r.choice([1, 2]),
        h=h,
        hk=r.choice([g for g in (1, 2, 4) if h % g == 0]),
        s=r.choice([256, 384, 512]),
        d=r.choice([64, 128]),
        k_bits=r.choice([8, 8, 4]),
        v_bits=r.choice([8, 8, 4]),
        t=r.choice([1, 1, 2, 4]),
        window=r.choice([0, 0, 100, 50]),
        sink=r.choice([0, 0, 32]),
        paged=r.random() < 0.4,
        block_kv=r.choice([64, 128]),
        heads_per_step=r.choice([None, 1, 2]),
        compute_mode=r.choice(["auto", "f32", "int_qk"]),
        short_row=r.random() < 0.5,  # one sequence much shorter
        fast_interior=r.random() < 0.5,  # default-off probe stays covered
    )


@pytest.mark.parametrize("seed", range(15))
def test_decode_flag_combination(seed):
    c = _sample(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    b, h, hk, s, d, t = c["b"], c["h"], c["hk"], c["s"], c["d"], c["t"]
    qshape = (b, t, h, d) if t > 1 else (b, h, d)
    q = jax.random.normal(ks[0], qshape)
    k = jax.random.normal(ks[1], (b, hk, s, d))
    v = jax.random.normal(ks[2], (b, hk, s, d))
    lengths = [s] * b
    if c["short_row"] and b > 1:
        lengths[-1] = max(t + 1, s // 3)
    lengths = jnp.asarray(lengths, jnp.int32)

    quant_k = quant_int8 if c["k_bits"] == 8 else quant_int4
    quant_v = quant_int8 if c["v_bits"] == 8 else quant_int4
    kc, ksc = quant_k(k, gran="per_token")
    vc, vsc = quant_v(v, gran="per_token")

    kw = dict(
        v_scale=vsc,
        k_bits=c["k_bits"],
        v_bits=c["v_bits"],
        window_size=c["window"] or None,
        sink_size=c["sink"] if c["window"] else 0,
        compute_mode=c["compute_mode"],
        heads_per_step=c["heads_per_step"],
        fast_interior=c["fast_interior"],
    )
    if c["paged"]:
        # shuffled page layout; page size == block_kv
        page = c["block_kv"]
        n_log = s // page
        perm = np.random.RandomState(seed).permutation(b * n_log)
        table = perm.reshape(b, n_log).astype(np.int32)
        kp = np.zeros((hk, b * n_log, page, kc.shape[-1]), np.int8)
        vp = np.zeros((hk, b * n_log, page, vc.shape[-1]), np.int8)
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
        kw["v_scale"] = jnp.asarray(vsp)
        kw["page_table"] = jnp.asarray(table)
        o = dec.decode_attention(
            q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(ksp), lengths, **kw
        )
    else:
        o = dec.decode_attention(q, kc, vc, ksc, lengths, block_kv=c["block_kv"], **kw)

    tol = 0.999
    if 4 in (c["k_bits"], c["v_bits"]):
        tol = 0.985
    for i in range(b):
        for tt in range(t):
            L = int(lengths[i]) - (t - 1 - tt)
            lo = max(0, L - c["window"]) if c["window"] else 0
            sk = min(c["sink"], lo) if c["window"] else 0
            ki = jnp.concatenate([k[i : i + 1, :, :sk], k[i : i + 1, :, lo:L]], axis=2)
            vi = jnp.concatenate([v[i : i + 1, :, :sk], v[i : i + 1, :, lo:L]], axis=2)
            qi = (q[i, tt] if t > 1 else q[i]).reshape(1, h, 1, d)
            ref = attention_reference(qi, ki, vi, sm_scale=1.0 / d**0.5)
            got = (o[i, tt] if t > 1 else o[i])[None, :, None, :]
            cos = float(cosine_similarity(got, ref))
            assert cos > tol, (c, i, tt, cos)
