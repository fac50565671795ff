"""Multi-device scaling harness: attention throughput at mesh sizes 1..N
with each sequence-parallel strategy, reporting scaling efficiency
(BASELINE.md north star: >=85% tokens/s efficiency at N>=2).

On CPU this validates logic/efficiency of the collective schedule, not
absolute speed:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench/scaling.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lowbit_quant_fa2_paddle_tpu.parallel.mesh import make_mesh
from lowbit_quant_fa2_paddle_tpu.parallel.ring import make_ring_attention
from lowbit_quant_fa2_paddle_tpu.parallel.sharded import make_head_parallel_attention
from lowbit_quant_fa2_paddle_tpu.parallel.ulysses import make_ulysses_attention
from lowbit_quant_fa2_paddle_tpu.utils.benchmark import measure_op_time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--strategies", nargs="+", default=["ring", "ulysses", "head_tp"])
    args = p.parse_args()

    n_dev = len(jax.devices())
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (args.batch, args.heads, args.seq, args.head_dim)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    tokens = args.batch * args.seq

    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_dev]
    base_tps = {}
    for strat in args.strategies:
        for n in sizes:
            if strat in ("ring", "ulysses") and args.heads % n:
                continue
            try:
                if strat == "ring":
                    fn = make_ring_attention(make_mesh({"seq": n}), axis_name="seq")
                elif strat == "ulysses":
                    fn = make_ulysses_attention(make_mesh({"seq": n}), axis_name="seq")
                else:
                    fn = make_head_parallel_attention(
                        make_mesh({"model": n}), data_axis="data", model_axis="model"
                    )
                t = measure_op_time(fn, (q, k, v), r1=3, r2=9)
                tps = tokens / t
                if n == 1:
                    base_tps[strat] = tps
                eff = tps / (base_tps.get(strat, tps) * n)
                print(json.dumps({
                    "strategy": strat, "devices": n,
                    "tokens_per_s": round(tps, 1),
                    "scaling_efficiency": round(eff, 3),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"strategy": strat, "devices": n,
                                  "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
