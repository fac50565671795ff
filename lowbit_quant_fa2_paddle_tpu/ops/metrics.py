"""Accuracy metrics used across tests and benchmarks.

The reference logs MSE vs SDPA per benchmark run (utils/benchmark.py:276-291);
we additionally report cosine similarity (the north-star accuracy metric in
BASELINE.md) and relative L1.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean((a - b) ** 2)


def cosine_similarity(a, b, eps: float = 1e-8):
    a = a.astype(jnp.float32).reshape(-1)
    b = b.astype(jnp.float32).reshape(-1)
    num = jnp.sum(a * b)
    den = jnp.sqrt(jnp.sum(a * a)) * jnp.sqrt(jnp.sum(b * b)) + eps
    return num / den


def relative_l1(a, b, eps: float = 1e-8):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.sum(jnp.abs(a - b)) / (jnp.sum(jnp.abs(b)) + eps)
