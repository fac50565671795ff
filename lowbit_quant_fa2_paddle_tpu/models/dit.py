"""Functional DiT (CogVideoX-2b-class) wired to the low-bit attention API.

The reference integrates by monkey-patching paddle's sdpa inside the
CogVideoX pipeline (reference example/sageattn_cogvideo.py:14-36 and
parallel_sageattn_cogvideo.py:45-54). Here the model is in-repo and
functional (pure pytree params + jit-able apply), with the attention
implementation pluggable per call:

* ``attn_impl='exact'``   — jnp einsum attention (differentiable; training)
* ``attn_impl='int8_train'`` — INT8 forward + straight-through fp backward
  (quantization-aware training against the serving kernel)
* ``attn_impl='fp'``      — Pallas FA2 kernel (bf16 inference baseline)
* ``attn_impl='fp_t'``    — float twin of the native transposed dataflow
* ``attn_impl='int8'``    — INT8-QK Pallas path (the product)
* ``attn_impl='int8_v8'`` — INT8-QK + INT8-V (fp8-PV analog)
* ``attn_impl='int4'``    — INT8-Q x INT4-K path
* ``attn_impl='int8_t'`` / ``'int4_t'`` — NATIVE transposed-space dataflow:
  the block runs the K-major kernel directly — Q stays natural (quantized
  in-kernel), K is quantized in natural layout, V^T comes straight out of
  the V projection einsum, and O^T folds into the output projection's
  dimension numbers. No transpose pass is ever materialized around the
  attention; this is the "model consumers fold O^T into the next matmul"
  integration the kernel's layout contract was designed for.

Flagship config mirrors CogVideoX-2b's attention geometry: 30 heads x
head_dim 64, hidden 1920, ~17k tokens for a 49x480x720 video latent
(SURVEY §7.6); sizes are configurable for tests.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.core import (
    lowbit_fa_qk_int4_pv_fp16,
    lowbit_fa_qk_int8_pv_fp16,
    lowbit_fa_qk_int8_pv_int8,
)
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    dim: int = 1920
    depth: int = 30
    num_heads: int = 30
    mlp_ratio: float = 4.0
    time_embed_dim: int = 256
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def tiny_config(**kw) -> DiTConfig:
    base = dict(dim=128, depth=2, num_heads=4, time_embed_dim=32)
    base.update(kw)
    return DiTConfig(**base)


def cogvideox_2b_config(**kw) -> DiTConfig:
    """CogVideoX-2b attention geometry (30 heads, hd64; SURVEY §7.6)."""
    base = dict(dim=1920, depth=30, num_heads=30, time_embed_dim=512)
    base.update(kw)
    return DiTConfig(**base)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense_init(key, d_in, d_out, dtype, scale=None):
    scale = scale if scale is not None else 1.0 / math.sqrt(d_in)
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * scale
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def init_dit_params(key: jax.Array, cfg: DiTConfig, *, zero_ada: bool = False) -> Params:
    """``zero_ada=True`` gives adaLN-zero gates (blocks start as identity —
    the training-stability init); the default activates the gates so a
    freshly initialized model actually exercises attention (required for
    inference/regression testing — identity blocks would make every
    attention implementation trivially "exact")."""
    keys = jax.random.split(key, cfg.depth + 3)
    d, dt = cfg.dim, cfg.dtype
    mlp_d = int(cfg.mlp_ratio * d)

    def block(k):
        ks = jax.random.split(k, 6)
        if zero_ada:
            ada = {
                "w": jnp.zeros((cfg.time_embed_dim, 6 * d), dt),
                "b": jnp.zeros((6 * d,), dt),
            }
        else:
            gate_bias = jnp.concatenate(
                [jnp.zeros((2 * d,)), jnp.ones((d,)),
                 jnp.zeros((2 * d,)), jnp.ones((d,))]
            ).astype(dt)  # sh_a, sc_a, g_a=1, sh_m, sc_m, g_m=1
            ada = {
                "w": (jax.random.normal(ks[5], (cfg.time_embed_dim, 6 * d), jnp.float32) * 0.02).astype(dt),
                "b": gate_bias,
            }
        return {
            "qkv": _dense_init(ks[0], d, 3 * d, dt),
            "proj": _dense_init(ks[1], d, d, dt),
            "mlp_in": _dense_init(ks[2], d, mlp_d, dt),
            "mlp_out": _dense_init(ks[3], mlp_d, d, dt),
            # adaLN modulation: 6 x dim (shift/scale/gate for attn + mlp).
            "ada": ada,
        }

    return {
        "t_embed": {
            "in": _dense_init(keys[0], cfg.time_embed_dim, cfg.time_embed_dim, dt),
            "out": _dense_init(keys[1], cfg.time_embed_dim, cfg.time_embed_dim, dt),
        },
        "blocks": [block(keys[2 + i]) for i in range(cfg.depth)],
        "final": _dense_init(keys[-1], d, d, dt, scale=0.02),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


_WQ_DIT_KEYS = ("qkv", "proj", "mlp_in", "mlp_out")


def quantize_dit_params(params: Params, *, bits: int = 8) -> Params:
    """Per-channel packed weights for every block dense layer (qkv / proj /
    mlp_in / mlp_out) through the fused gemv kernel — the weight-serving
    counterpart of the quantized attention path. The adaLN modulation,
    t_embed, and final head stay dense (tiny and conditioning-critical)."""
    from lowbit_quant_fa2_paddle_tpu.ops import gemv

    out = dict(params)
    blocks = []
    for blk in params["blocks"]:
        nb = dict(blk)
        for key in _WQ_DIT_KEYS:
            packed, scale = gemv.pack_weights_per_channel(blk[key]["w"].T, bits=bits)
            nb[key] = {"wq": gemv.WQWeight(packed, scale, bits), "b": blk[key]["b"]}
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def _dense(p, x):
    if "wq" in p:
        from lowbit_quant_fa2_paddle_tpu.ops import gemv

        wq = p["wq"]
        return gemv.wq_matmul_per_channel(x, wq.packed, wq.scale, bits=wq.bits) + p["b"]
    return x @ p["w"] + p["b"]


def _layer_norm(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def timestep_embedding(t: jax.Array, dim: int, dtype) -> jax.Array:
    """Sinusoidal embedding of diffusion timestep ``t`` [B]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1).astype(dtype)


def _attention(q, k, v, impl: str, interpret: Optional[bool]):
    """q/k/v: [B, H, S, D] (HND)."""
    if impl == "exact":
        return attention_reference(q, k, v)
    if impl == "flash_train":
        # differentiable Pallas flash attention (custom_vjp) — the memory-
        # efficient training path (no [S,S] logits materialization).
        from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
            flash_attention_trainable,
        )

        return flash_attention_trainable(q, k, v).astype(q.dtype)
    if impl == "int8_train":
        # Quantization-aware training: INT8 forward (the serving kernel),
        # straight-through fp backward — train against what you deploy.
        from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
            lowbit_attention_trainable,
        )

        return lowbit_attention_trainable(q, k, v).astype(q.dtype)
    if impl == "fp":
        return flash_attention_fp(q, k, v, interpret=interpret).astype(q.dtype)
    if impl == "int8":
        return lowbit_fa_qk_int8_pv_fp16(q, k, v, interpret=interpret)
    if impl == "int8_v8":
        return lowbit_fa_qk_int8_pv_int8(q, k, v, interpret=interpret)
    if impl == "int4":
        return lowbit_fa_qk_int4_pv_fp16(q, k, v, interpret=interpret)
    raise ValueError(f"unknown attn_impl {impl!r}")


def _attention_km_native(p: Params, xa: jax.Array, h: int, hd: int,
                         attn_impl: str, interpret: Optional[bool]) -> jax.Array:
    """Transposed-space attention dataflow (K-major kernel, zero transpose
    passes): V^T is emitted by the V projection's dimension numbers, Q is
    quantized in-kernel from its natural projection, K is quantized in
    natural layout (the K-major kernel never wants K^T), and the returned
    O^T [B,H,D,S] is contracted straight into the output projection by the
    caller. Requires unquantized qkv weights (the gemv path emits flat
    rows); head_dim must be a lane multiple."""
    from lowbit_quant_fa2_paddle_tpu.ops import quant as quant_ops
    from lowbit_quant_fa2_paddle_tpu.ops.attention import lowbit_attention_km

    d = xa.shape[-1]
    w3 = p["qkv"]["w"].reshape(d, 3, h, hd)
    b3 = p["qkv"]["b"].reshape(3, h, hd)
    k = jnp.einsum("bse,ehd->bhsd", xa, w3[:, 1]) + b3[1][None, :, None, :]
    vT = jnp.einsum("bse,ehd->bhds", xa, w3[:, 2]) + b3[2][None, :, :, None]
    if attn_impl == "fp_t":
        # Float twin of the native dataflow: Q^T straight from the
        # projection's dimension numbers, no quantization anywhere.
        qT = jnp.einsum("bse,ehd->bhds", xa, w3[:, 0]) + b3[0][None, :, :, None]
        return lowbit_attention_km(
            qT, k, vT, None, None,
            sm_scale=1.0 / math.sqrt(hd),
            out_dtype=xa.dtype,
            interpret=interpret,
        )
    q = jnp.einsum("bse,ehd->bhsd", xa, w3[:, 0]) + b3[0][None, :, None, :]
    km_mean = quant_ops.k_mean(k)
    if attn_impl == "int4_t":
        k_codes, k_scale = quant_ops.quant_int4(k, km_mean, gran="per_token", interpret=interpret)
        packed = True
    else:
        k_codes, k_scale = quant_ops.quant_int8(k, km_mean, gran="per_token", interpret=interpret)
        packed = False
    return lowbit_attention_km(
        q,
        k_codes,
        vT,
        k_scale=k_scale,
        fused_quant_q=True,
        k_packed_int4=packed,
        sm_scale=1.0 / math.sqrt(hd),
        out_dtype=xa.dtype,
        interpret=interpret,
    )  # O^T [B,H,hd,S]


def dit_block_forward(p: Params, x: jax.Array, c: jax.Array, cfg: DiTConfig,
                      attn_impl: str, interpret: Optional[bool]) -> jax.Array:
    """One DiT block. x: [B, S, dim]; c: [B, time_embed_dim] conditioning."""
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    mod = _dense(p["ada"], jax.nn.silu(c))[:, None, :]  # [B,1,6d]
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)

    xa = _layer_norm(x) * (1 + sc_a) + sh_a
    if (attn_impl in ("int8_t", "int4_t", "fp_t") and "w" in p["qkv"]
            and "w" in p["proj"] and hd % 64 == 0):
        oT = _attention_km_native(p, xa, h, hd, attn_impl, interpret)
        # O^T folds into the output projection's contraction dims — the
        # transpose rides the MXU's dimension numbers instead of an XLA
        # relayout pass.
        wp = p["proj"]["w"]
        o_proj = jnp.einsum("bhds,hde->bse", oT.astype(x.dtype), wp.reshape(h, hd, d))
        x = x + g_a * (o_proj + p["proj"]["b"])
    else:
        if attn_impl in ("int8_t", "int4_t", "fp_t"):  # no native-layout route
            attn_impl = attn_impl[:-2]
        qkv = _dense(p["qkv"], xa).reshape(b, s, 3, h, hd)
        q, k, v = (jnp.swapaxes(qkv[:, :, i], 1, 2) for i in range(3))  # [B,H,S,hd]
        o = _attention(q, k, v, attn_impl, interpret)
        o = jnp.swapaxes(o, 1, 2).reshape(b, s, d).astype(x.dtype)
        x = x + g_a * _dense(p["proj"], o)

    xm = _layer_norm(x) * (1 + sc_m) + sh_m
    x = x + g_m * _dense(p["mlp_out"], jax.nn.gelu(_dense(p["mlp_in"], xm)))
    return x


def dit_forward(
    params: Params,
    x: jax.Array,
    t: jax.Array,
    cfg: DiTConfig,
    *,
    attn_impl: str = "int8",
    scan_blocks: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Denoiser forward: x [B, S, dim] noisy latents, t [B] timesteps ->
    predicted noise [B, S, dim].

    ``scan_blocks`` runs the block stack under ``lax.scan`` over stacked
    parameters: one block is traced/compiled once regardless of depth —
    required for big-sequence configs whose fully-unrolled HLO exceeds
    compile-service limits, and much faster to compile at depth 30."""
    c = timestep_embedding(t, cfg.time_embed_dim, cfg.dtype)
    c = _dense(params["t_embed"]["out"], jax.nn.silu(_dense(params["t_embed"]["in"], c)))
    if scan_blocks:
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *params["blocks"]
        )

        def body(x, blk):
            return dit_block_forward(blk, x, c, cfg, attn_impl, interpret), None

        x, _ = jax.lax.scan(body, x, stacked)
    else:
        for blk in params["blocks"]:
            x = dit_block_forward(blk, x, c, cfg, attn_impl, interpret)
    return _dense(params["final"], _layer_norm(x))


# ---------------------------------------------------------------------------
# Training step (diffusion denoising MSE)
# ---------------------------------------------------------------------------


def diffusion_loss(params, batch, key, cfg: DiTConfig, attn_impl: str = "exact"):
    """Simple DDPM-style epsilon-prediction MSE. Training uses the
    differentiable attention path (the quantized kernels are inference
    operators, as in the reference — an inference-only library)."""
    x0 = batch  # [B, S, dim] clean latents
    kt, kn = jax.random.split(key)
    t = jax.random.uniform(kt, (x0.shape[0],), minval=0.0, maxval=1.0)
    noise = jax.random.normal(kn, x0.shape, x0.dtype)
    a = jnp.cos(0.5 * jnp.pi * t)[:, None, None].astype(x0.dtype)
    s = jnp.sin(0.5 * jnp.pi * t)[:, None, None].astype(x0.dtype)
    xt = a * x0 + s * noise
    pred = dit_forward(params, xt, t * 1000.0, cfg, attn_impl=attn_impl)
    return jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)


def sgd_train_step(params, batch, key, cfg: DiTConfig, lr: float = 1e-4,
                   attn_impl: str = "exact"):
    loss, grads = jax.value_and_grad(diffusion_loss)(params, batch, key, cfg, attn_impl)
    params = jax.tree_util.tree_map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return params, loss
