"""lowbit_quant_fa2_paddle_tpu — TPU-native low-bit FlashAttention-2 engine.

A from-scratch JAX/Pallas re-design of the capabilities of
Charles2530/lowbit_quant_fa2_paddle (the PaddlePaddle SageAttention port):
INT8/INT4/INT2 quantized-QK FlashAttention with reduced-precision PV, the
quantization kernels that feed it, a dispatching public API, varlen and
decode paths, a first-class distributed layer (ring / Ulysses / head-TP over
a jax device mesh), model integrations, and a benchmark harness.

Public surface mirrors the reference's (reference: src/__init__.py:1-17),
exporting both the legacy ``sageattn*`` names and the preferred
``lowbit_fa_*`` names.
"""

from lowbit_quant_fa2_paddle_tpu.core import (
    lowbit_fa_attn,
    lowbit_fa_qk_int8_pv_fp16,
    lowbit_fa_qk_int8_pv_int8,
    lowbit_fa_qk_int4_pv_fp16,
    lowbit_fa_qk_int2_pv_fp16,
    lowbit_fa_mixed_bits,
    lowbit_fa_varlen,
    lowbit_fa_multi_precision,
    lowbit_fa_qk_int8_pv_fp16_triton,
    lowbit_fa_qk_int8_pv_fp16_cuda,
    lowbit_fa_qk_int8_pv_fp8_cuda,
    lowbit_fa_qk_int4_pv_fp16_triton,
    sageattn,
    sageattn_qk_int8_pv_fp16_triton,
    sageattn_qk_int8_pv_fp16_cuda,
    sageattn_qk_int8_pv_fp8_cuda,
    sageattn_qk_int4_pv_fp16_triton,
    sageattn_varlen,
    sageattn_multi_precision,
)
from lowbit_quant_fa2_paddle_tpu.ops.attention import flash_attention_fp
from lowbit_quant_fa2_paddle_tpu.ops.attention_bwd import (
    flash_attention_trainable,
    lowbit_attention_trainable,
)

__version__ = "0.1.0"

__all__ = [
    "lowbit_fa_attn",
    "lowbit_fa_qk_int8_pv_fp16",
    "lowbit_fa_qk_int8_pv_int8",
    "lowbit_fa_qk_int4_pv_fp16",
    "lowbit_fa_qk_int2_pv_fp16",
    "lowbit_fa_mixed_bits",
    "lowbit_fa_varlen",
    "lowbit_fa_multi_precision",
    "flash_attention_fp",
    "flash_attention_trainable",
    "lowbit_attention_trainable",
    "lowbit_fa_qk_int8_pv_fp16_triton",
    "lowbit_fa_qk_int8_pv_fp16_cuda",
    "lowbit_fa_qk_int8_pv_fp8_cuda",
    "lowbit_fa_qk_int4_pv_fp16_triton",
    "sageattn",
    "sageattn_qk_int8_pv_fp16_triton",
    "sageattn_qk_int8_pv_fp16_cuda",
    "sageattn_qk_int8_pv_fp8_cuda",
    "sageattn_qk_int4_pv_fp16_triton",
    "sageattn_varlen",
    "sageattn_multi_precision",
]
