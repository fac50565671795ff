"""DiT model + sharded training step tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from lowbit_quant_fa2_paddle_tpu.models import dit
from lowbit_quant_fa2_paddle_tpu.ops import metrics


def _setup(s=128, b=2):
    cfg = dit.tiny_config()
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.dim), cfg.dtype)
    t = jnp.array([10.0] * b)
    return cfg, params, x, t


def test_dit_forward_shapes():
    cfg, params, x, t = _setup()
    out = dit.dit_forward(params, x, t, cfg, attn_impl="exact")
    assert out.shape == x.shape


def test_dit_quantized_matches_exact():
    """INT8 inference path must track the exact path closely."""
    cfg, params, x, t = _setup()
    o_exact = dit.dit_forward(params, x, t, cfg, attn_impl="exact")
    for impl in ("fp", "int8", "int8_v8", "int4"):
        o_q = dit.dit_forward(params, x, t, cfg, attn_impl=impl)
        cos = float(metrics.cosine_similarity(o_q, o_exact))
        assert cos > 0.98, (impl, cos)


def test_dit_quantized_weights_track_dense():
    """Per-channel packed block weights (fused gemv) track the dense model,
    including under the scanned-blocks path (stacked WQWeight pytree)."""
    cfg, params, x, t = _setup()
    o_d = dit.dit_forward(params, x, t, cfg, attn_impl="exact")
    for bits, thresh in ((8, 0.999), (4, 0.95)):
        qp = dit.quantize_dit_params(params, bits=bits)
        o_q = dit.dit_forward(qp, x, t, cfg, attn_impl="exact")
        cos = float(metrics.cosine_similarity(o_q, o_d))
        assert cos > thresh, (bits, cos)
    qp = dit.quantize_dit_params(params, bits=8)
    o_scan = dit.dit_forward(qp, x, t, cfg, attn_impl="exact", scan_blocks=True)
    cos = float(metrics.cosine_similarity(o_scan, o_d))
    assert cos > 0.999, cos


def test_dit_train_step_reduces_loss():
    cfg, params, x, t = _setup(s=64)
    key = jax.random.PRNGKey(3)
    step = jax.jit(lambda p, b, k: dit.sgd_train_step(p, b, k, cfg, lr=1e-2))
    losses = []
    for i in range(5):
        params, loss = step(params, x, jax.random.fold_in(key, 0))  # fixed batch+noise
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_dit_train_step_flash_kernel():
    """Training through the Pallas flash kernel (custom_vjp) works."""
    cfg, params, x, t = _setup(s=64)
    step = jax.jit(
        lambda p, b, k: dit.sgd_train_step(p, b, k, cfg, lr=1e-2, attn_impl="flash_train")
    )
    losses = []
    key = jax.random.PRNGKey(5)
    for _ in range(3):
        params, loss = step(params, x, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape


def test_dit_native_transposed_dataflow():
    """attn_impl='int8_t'/'int4_t': the K-major kernel wired natively into
    the block (V^T from the projection, O^T folded into the out-projection,
    Q quantized in-kernel) must track both the wrapper path and exact."""
    cfg = dit.DiTConfig(dim=256, depth=2, num_heads=4, time_embed_dim=32,
                        dtype=jnp.float32)
    params = dit.init_dit_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 300, cfg.dim), cfg.dtype)
    t = jnp.array([10.0, 500.0])
    o_exact = dit.dit_forward(params, x, t, cfg, attn_impl="exact")
    o_int8 = dit.dit_forward(params, x, t, cfg, attn_impl="int8")
    o_t8 = dit.dit_forward(params, x, t, cfg, attn_impl="int8_t")
    o_t4 = dit.dit_forward(params, x, t, cfg, attn_impl="int4_t")
    assert float(metrics.cosine_similarity(o_t8, o_int8)) > 0.9999
    assert float(metrics.cosine_similarity(o_t8, o_exact)) > 0.999
    assert float(metrics.cosine_similarity(o_t4, o_exact)) > 0.99


def test_dit_native_transposed_falls_back_small_head():
    # tiny_config has head_dim 32 (< lane width): int8_t must silently use
    # the wrapper path and still be accurate.
    cfg, params, x, t = _setup()
    o = dit.dit_forward(params, x, t, cfg, attn_impl="int8_t")
    o_exact = dit.dit_forward(params, x, t, cfg, attn_impl="exact")
    assert float(metrics.cosine_similarity(o, o_exact)) > 0.98
