"""Benchmark harness (reference utils/benchmark.py + utils/paddle_package.py).

Keeps the reference's conventions exactly:
* ``flops = 4*B*H*D*S^2``, halved when causal (utils/benchmark.py:212-214);
* TFLOP/s = flops / mean latency;
* warmup + timed reps.

Timing is TPU-remote-safe. On some transports ``block_until_ready`` acks
before the device finishes, so wall-clock timing of N independent dispatches
is meaningless. Instead the whole measurement is ONE jitted ``lax.scan`` of
the op, with ``jax.lax.optimization_barrier`` tying each iteration's inputs
to the previous iteration's outputs (a value-preserving, un-foldable data
dependency — XLA cannot hoist or elide any iteration), terminated by a
scalar device->host fetch. Constant dispatch/fetch overhead is removed with
a two-point slope fit across rep counts: ``t = (T(r2)-T(r1)) / (r2-r1)``.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _chained(fn: Callable, reps: int):
    """Jitted runner of ``reps`` serialized iterations of ``fn``.

    Both barrier outputs are consumed: the carry serializes iterations, and a
    scalar probe of EVERY leaf of each iteration's output is summed into the
    fetched result — XLA prunes unused optimization_barrier outputs, which
    would DCE the producing computation. Probing only the first leaf is not
    enough: for multi-output fns whose leaves come from independent
    computations (e.g. ``value_and_grad`` — loss is leaf 0, grads are the
    rest), the unprobed leaves' entire backward was measured DCE'd (fwd+bwd
    "cost" 1.02x fwd until every leaf was consumed; true ratio 2.9x)."""

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry)
            carry, out = jax.lax.optimization_barrier((carry, out))
            probe = sum(
                leaf.ravel()[0].astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out)
            )
            return carry, probe

        _, probes = jax.lax.scan(body, tuple(args), None, length=reps)
        return probes.sum()

    return run


def measure_op_time(
    fn: Callable,
    args: Sequence,
    *,
    r1: int = 8,
    r2: int = 24,
    samples: int = 3,
) -> float:
    """Mean seconds per call of ``fn(*args)`` (first output fetched).

    Each rep count is sampled ``samples`` times and the MINIMUM is used —
    the remote transport occasionally injects hundreds of ms of one-sided
    latency, which would otherwise corrupt the slope fit."""
    times = {}
    for r in (r1, r2):
        f = _chained(fn, r)
        np.asarray(f(tuple(args)))  # compile + warmup
        best = float("inf")
        for _ in range(samples):
            t0 = time.perf_counter()
            np.asarray(f(tuple(args)))
            best = min(best, time.perf_counter() - t0)
        times[r] = best
    dt = (times[r2] - times[r1]) / (r2 - r1)
    # Guard the fit: per-rep time can't exceed the r2 mean nor plausibly sit
    # below 20% of it (both indicate a corrupted sample).
    mean2 = times[r2] / r2
    if not (0.2 * mean2 <= dt <= 1.5 * mean2):
        dt = mean2
    return dt


def attention_flops(b: int, h: int, d: int, s_q: int, s_k: int, causal: bool) -> int:
    """Reference TFLOP convention (utils/benchmark.py:212-214,266)."""
    f = 4 * b * h * d * s_q * s_k
    return f // 2 if causal else f


def tflops(flops: int, seconds: float) -> float:
    return flops / seconds / 1e12


def device_memory_stats(device=None) -> dict:
    """Device memory accounting for bench artifacts (the reference reports
    peak memory per e2e run, example/parallel_sageattn_cogvideo.py:100-104).
    Returns {} when the backend doesn't expose memory_stats (CPU/interpret,
    and the axon relay, whose PJRT plugin returns None) — artifacts fall
    back to analytic byte accounting (cache/param sizes) in that case."""
    d = device if device is not None else jax.devices()[0]
    try:
        s = d.memory_stats() or {}
    except Exception:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
            "largest_alloc_size")
    out = {k: int(s[k]) for k in keys if k in s}
    if "peak_bytes_in_use" in out:
        out["peak_gb"] = round(out["peak_bytes_in_use"] / 2**30, 3)
    return out
