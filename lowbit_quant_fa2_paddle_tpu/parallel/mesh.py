"""Device mesh construction and multi-host initialization.

Replaces the reference's external launcher plumbing (torchrun + xfuser degree
flags, example/run_parallel.sh:36-44; sglang init_distributed_environment,
src/triton/utils/main.py:14-15) with jax-native equivalents:

* ``make_mesh`` — named mesh over (data, seq, model) axes; the xfuser degrees
  map as: data_parallel/CFG-parallel -> 'data', ulysses/ring -> 'seq',
  tensor_parallel -> 'model'.
* ``init_distributed`` — multi-host (DCN) process group bring-up.
"""

from __future__ import annotations

import math
from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

#: Canonical axis order. Outer-to-inner: 'data' over DCN-or-ICI, 'seq' and
#: 'model' innermost so their collectives (ppermute rings, all-to-alls) ride
#: ICI neighbours.
AXES = ("data", "seq", "model")


def make_mesh(
    degrees: Optional[Mapping[str, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named device mesh.

    ``degrees`` maps axis name -> size, e.g. ``{"data": 2, "seq": 2,
    "model": 2}`` (xfuser's --data_parallel/--ulysses/--tensor_parallel
    degrees, reference example/parallel_sageattn_cogvideo.py:85). Missing
    axes default to 1; one unset axis may be -1 to absorb the remaining
    devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    degrees = dict(degrees or {})
    sizes = [int(degrees.get(a, 1)) for a in AXES]
    if -1 in sizes:
        known = math.prod(s for s in sizes if s != -1)
        assert n % known == 0, (n, sizes)
        sizes[sizes.index(-1)] = n // known
    used = math.prod(sizes)
    assert used <= n, f"mesh {dict(zip(AXES, sizes))} needs {used} devices, have {n}"
    dev_array = np.array(devices[:used]).reshape(sizes)
    return Mesh(dev_array, AXES)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up over DCN (jax.distributed). No-op when
    single-process. The NCCL/torchrun layer of the reference has no direct
    analog: XLA owns the collectives once the process group exists."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
