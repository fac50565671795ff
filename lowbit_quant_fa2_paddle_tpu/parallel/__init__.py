"""Distributed layer: device meshes, sharded/ring/Ulysses attention.

The reference has *no* in-repo distributed code — it delegates to external
xDiT/xfuser + NCCL (reference example/run_parallel.sh:36-44). Here the
distributed layer is first-class and TPU-native: jax.sharding meshes, XLA
collectives over ICI/DCN, shard_map'd Pallas kernels.
"""

from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
from lowbit_quant_fa2_paddle_tpu.parallel.ring import make_ring_attention
from lowbit_quant_fa2_paddle_tpu.parallel.serving import (
    make_context_sharded_decode,
    make_head_sharded_decode,
)
from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import make_ulysses_attention

__all__ = [
    "make_mesh",
    "make_ring_attention",
    "make_ulysses_attention",
    "make_context_sharded_decode",
    "make_head_sharded_decode",
]
