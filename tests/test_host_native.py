"""Native host runtime tests — run against both the C++ extension (when
built) and the numpy fallback; both must agree with the Pallas quantizers."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowbit_quant_fa2_paddle_tpu import host
from lowbit_quant_fa2_paddle_tpu.ops import quant as q_ops


def _fallback(monkeypatch):
    monkeypatch.setattr(host, "_native", None)


@pytest.fixture(params=["native", "fallback"])
def backend(request, monkeypatch):
    if request.param == "native":
        if not host.HAVE_NATIVE:
            pytest.skip("extension not built")
    else:
        monkeypatch.setattr(host, "_native", None)
    return request.param


def test_pack_unpack_int4(backend):
    rng = np.random.RandomState(0)
    codes = rng.randint(-7, 8, (16, 64)).astype(np.int8)
    packed = host.pack_int4(codes)
    assert packed.shape == (16, 32)
    out = host.unpack_int4(packed)
    np.testing.assert_array_equal(out, codes)


def test_pack_matches_pallas_layout(backend):
    """Host packing must be byte-identical to the Pallas quantizer's packed
    output for the same codes."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 128, 64))
    packed_pallas, scale = q_ops.quant_int4(x, gran="per_token")
    codes = np.asarray(q_ops.unpack_int4(packed_pallas))[0, 0]
    packed_host = host.pack_int4(codes)
    np.testing.assert_array_equal(packed_host, np.asarray(packed_pallas)[0, 0])


def test_quant_int8_per_token_matches_pallas(backend):
    rng = np.random.RandomState(1)
    x = rng.randn(32, 64).astype(np.float32)
    codes, scales = host.quant_int8_per_token(x)
    codes_p, scales_p = q_ops.quant_int8(jnp.asarray(x)[None, None], gran="per_token")
    np.testing.assert_array_equal(codes, np.asarray(codes_p)[0, 0])
    np.testing.assert_allclose(scales, np.asarray(scales_p)[0, 0], rtol=1e-6)


def test_page_allocator(backend):
    a = host.PageAllocator(8)
    s0 = a.new_seq()
    s1 = a.new_seq()
    p0 = [a.append_page(s0) for _ in range(3)]
    p1 = [a.append_page(s1) for _ in range(2)]
    assert len(set(p0) | set(p1)) == 5  # all distinct
    assert a.seq_pages(s0) == p0
    st = a.stats()
    assert st["free_pages"] == 3 and st["num_seqs"] == 2
    a.free_seq(s0)
    st = a.stats()
    assert st["free_pages"] == 6 and st["num_seqs"] == 1
    # freed pages are reusable
    s2 = a.new_seq()
    got = [a.append_page(s2) for _ in range(6)]
    assert len(set(got) | set(p1)) == 8
    with pytest.raises(MemoryError):
        a.append_page(s2)


def test_native_is_built():
    """The extension should be built in this repo (setup.py build_ext)."""
    assert host.HAVE_NATIVE, "run: python setup.py build_ext --inplace"
