"""Multi-process distributed tests for parallel/mesh.init_distributed.

The reference actually launches 2 ranks (torchrun, run_parallel.sh:36-44);
everything else in this repo's distributed story runs single-process on the
virtual 8-device CPU mesh. These tests close that seam with TWO real OS
processes that rendezvous through jax.distributed over localhost and then
run REAL cross-process computation on the global mesh (gloo CPU
collectives, verified present in this jax build):

  * a psum across all 4 global devices (2 processes x 2 local), result
    asserted in both processes;
  * one quantized ring-attention pass sequence-sharded across the
    2-process mesh (parallel/ring.py — ppermute KV rotation + psum'd
    smooth-K mean riding the DCN seam), each process checking its
    addressable output shards against the locally-computed full oracle.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
import jax.numpy as jnp
import numpy as np
import functools
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from lowbit_quant_fa2_paddle_tpu.parallel.mesh import init_distributed
from lowbit_quant_fa2_paddle_tpu.parallel.ring import ring_attention
from lowbit_quant_fa2_paddle_tpu.ops.reference import attention_reference

addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
init_distributed(coordinator_address=addr, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid
n_loc = len(jax.local_devices())
n_glob = len(jax.devices())
assert n_glob == nproc * n_loc, (jax.devices(), jax.local_devices())

mesh = Mesh(np.array(jax.devices()).reshape(-1), ("seq",))

# --- 1. cross-process psum over the global mesh ------------------------
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("seq")),
    np.full((n_loc,), float(pid + 1), np.float32),
)
total = jax.jit(jax.shard_map(
    lambda a: jax.lax.psum(a, "seq"),
    mesh=mesh, in_specs=P("seq"), out_specs=P(),
))
want = sum((i + 1) * n_loc for i in range(nproc))
got = float(np.asarray(total(x).addressable_data(0))[0])
assert got == want, (got, want)
print(f"worker {pid}: psum ok", flush=True)

# --- 2. ring attention sequence-sharded across both processes ----------
B, H, S, D = 1, 2, 256, 64
rng = np.random.RandomState(11)  # same seed in both processes
qf = rng.randn(B, H, S, D).astype(np.float32)
kf = rng.randn(B, H, S, D).astype(np.float32)
vf = rng.randn(B, H, S, D).astype(np.float32)
spec = P(None, None, "seq", None)
sl = slice(pid * (S // nproc), (pid + 1) * (S // nproc))
shard = lambda a: jax.make_array_from_process_local_data(
    NamedSharding(mesh, spec), a[:, :, sl, :]
)
ring = jax.jit(jax.shard_map(
    functools.partial(ring_attention, axis_name="seq", is_causal=True),
    mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False,
))
out = ring(shard(qf), shard(kf), shard(vf))
ref = np.asarray(attention_reference(
    jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf), is_causal=True
), np.float32)
s_dev = S // n_glob
for di, shard_out in enumerate(out.addressable_shards):
    g0 = shard_out.index[2].start
    a = np.asarray(shard_out.data, np.float32).ravel()
    b = ref[:, :, g0 : g0 + s_dev, :].ravel()
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.999, (pid, di, g0, cos)
print(f"worker {pid}: ring ok", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum_and_ring(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: psum ok" in out, out
        assert f"worker {pid}: ring ok" in out, out
