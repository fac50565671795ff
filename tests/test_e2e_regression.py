"""End-to-end DiT regression (the reference's video_test in test form):
multi-step generation with quantized attention must track the exact baseline."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"))

import jax
import jax.numpy as jnp
import pytest

from lowbit_quant_fa2_paddle_tpu.models import dit
from lowbit_quant_fa2_paddle_tpu.ops.metrics import cosine_similarity, mse


@pytest.fixture(scope="module")
def setup():
    cfg = dit.tiny_config(num_heads=4, dim=256, depth=2)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _generate(params, cfg, impl, steps=5, seq=256):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, seq, cfg.dim), cfg.dtype)
    step = jax.jit(
        lambda x, t: x - 0.1 * dit.dit_forward(params, x, t, cfg, attn_impl=impl)
    )
    for i in range(steps):
        x = step(x, jnp.array([1000.0 * (1.0 - i / steps)]))
    return x


def test_e2e_int8_regression(setup):
    cfg, params = setup
    base = _generate(params, cfg, "exact")
    for impl, cos_min in [("fp", 0.999), ("int8", 0.99), ("int8_v8", 0.99),
                          ("int4", 0.95), ("int8_t", 0.99), ("int4_t", 0.95)]:
        out = _generate(params, cfg, impl)
        cos = float(cosine_similarity(out, base))
        assert cos > cos_min, (impl, cos)
        # error must not blow up over steps (bounded frame mse)
        assert float(mse(out, base)) < 0.5, impl
