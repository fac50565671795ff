"""Distributed layer: device meshes, sharded/ring/Ulysses attention.

The reference has *no* in-repo distributed code — it delegates to external
xDiT/xfuser + NCCL (reference example/run_parallel.sh:36-44). Here the
distributed layer is first-class and TPU-native: jax.sharding meshes, XLA
collectives over ICI/DCN, shard_map'd Pallas kernels.
"""

from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
