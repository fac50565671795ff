"""Multi-process bring-up smoke test for parallel/mesh.init_distributed.

The reference actually launches 2 ranks (torchrun, run_parallel.sh:36-44);
everything else in this repo's distributed story runs single-process on the
virtual 8-device CPU mesh. This test closes that seam: it spawns TWO real
OS processes that rendezvous through jax.distributed over localhost, checks
the global process/device view from both sides, and (when this jax build
ships CPU cross-process collectives) runs a psum across the 2-process mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
from lowbit_quant_fa2_paddle_tpu.parallel.mesh import init_distributed

addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
init_distributed(coordinator_address=addr, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == nproc * len(jax.local_devices()), (
    jax.devices(), jax.local_devices())

# cross-process collective (psum over the global mesh) — optional: some CPU
# builds lack cross-host CPU collectives; bring-up above is the hard seam.
status = "ok-no-collectives"
try:
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((len(jax.local_devices()),), float(pid + 1), np.float32),
    )
    from jax.experimental.shard_map import shard_map

    total = jax.jit(shard_map(
        lambda a: jax.lax.psum(a, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    ))
    # expected: sum over all global entries of (process_id + 1)
    want = sum((i + 1) * len(jax.local_devices()) for i in range(nproc))
    got = float(np.asarray(total(x).addressable_data(0))[0])
    assert got == want, (got, want)
    status = "ok-collectives"
except Exception as e:  # pragma: no cover - build-dependent
    status = f"ok-no-collectives ({type(e).__name__})"
print(f"worker {pid}: {status}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_bringup(tmp_path):
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
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: ok" in out, out
