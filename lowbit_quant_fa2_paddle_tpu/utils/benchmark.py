"""Benchmark harness (reference utils/benchmark.py + utils/paddle_package.py).

Keeps the reference's conventions exactly:
* ``flops = 4*B*H*D*S^2``, halved when causal (utils/benchmark.py:212-214);
* TFLOP/s = flops / mean latency;
* warmup + timed reps.

Timing is TPU-remote-safe: on some transports ``block_until_ready`` acks
before the device finishes, so wall-clock timing uses **chained data
dependencies** (the output of call *i* feeds call *i+1*) terminated by a
scalar device->host fetch, and removes the constant fetch/dispatch overhead
with a two-point slope fit: t = (T(r2) - T(r1)) / (r2 - r1).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np


def _run_chain(fn: Callable, args: Sequence, feedback: int, reps: int) -> float:
    """Run ``reps`` chained calls (arg[feedback] <- previous output), force
    completion with a scalar fetch, return elapsed seconds."""
    args = list(args)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        args[feedback] = first
    np.asarray(jax.tree_util.tree_leaves(first)[0].ravel()[0])  # sync fetch
    return time.perf_counter() - t0


def measure_op_time(
    fn: Callable,
    args: Sequence,
    *,
    feedback: int,
    warmup: int = 3,
    r1: int = 5,
    r2: int = 15,
) -> float:
    """Mean seconds per call of ``fn(*args)``.

    ``feedback`` is the index of an argument with the same shape/dtype as the
    (first) output; it is replaced by the previous output to serialize calls
    without per-call host sync.
    """
    _run_chain(fn, args, feedback, warmup)
    t_a = _run_chain(fn, args, feedback, r1)
    t_b = _run_chain(fn, args, feedback, r2)
    dt = (t_b - t_a) / (r2 - r1)
    if dt <= 0:  # noisy environment — fall back to the larger measurement
        dt = t_b / r2
    return dt


def attention_flops(b: int, h: int, d: int, s_q: int, s_k: int, causal: bool) -> int:
    """Reference TFLOP convention (utils/benchmark.py:212-214,266)."""
    f = 4 * b * h * d * s_q * s_k
    return f // 2 if causal else f


def tflops(flops: int, seconds: float) -> float:
    return flops / seconds / 1e12
