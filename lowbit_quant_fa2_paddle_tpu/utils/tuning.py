"""Persistent block-size tuning cache for the attention kernels.

The reference bakes its tuning as static per-kernel constant tables
(num_warps/num_stages in every Triton file, e.g. reference
src/triton/attn_qk_int8_per_block.py:169-238, chosen once for its GPUs).
On TPU any block shape compiles on demand, so tuning is a runtime sweep
(bench/autotune.py); this module makes its results durable: the launcher
consults the cache before falling back to the built-in measured defaults.

Cache file: ``$LOWBIT_FA_TUNING_CACHE`` or ``~/.cache/lowbit_fa_tpu/
tuning.json``. Entries are keyed by (device kind, kernel schedule,
head_dim, seq, causal) — batch/head counts only scale the grid's parallel
dims and don't move the per-block optimum.

Usage:
  python bench/autotune.py --seq 4096 --save       # sweep + record
  # ...the API then picks the tuned blocks automatically when the caller
  # leaves block_q/block_kv unset.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional, Tuple

_LOCK = threading.RLock()  # record() -> _load() re-enters
_CACHE: Optional[dict] = None


def cache_path() -> str:
    return os.environ.get(
        "LOWBIT_FA_TUNING_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "lowbit_fa_tpu", "tuning.json"
        ),
    )


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # backend not initialized / no devices
        return "unknown"


def _key(kernel: str, d: int, s: int, causal: bool, device: Optional[str]) -> str:
    dev = device if device is not None else _device_kind()
    return f"{dev}|{kernel}|d{d}|s{s}|c{int(bool(causal))}"


def _bundled_path() -> str:
    return os.path.join(os.path.dirname(__file__), "tuning_defaults.json")


def _read_json(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _load() -> dict:
    """Merged lookup view: bundled measured defaults (shipped with the
    package, durable across machines of the same device kind) overridden
    entry-by-entry by the user cache. The user cache FILE never absorbs
    bundled entries — record() rewrites only user-recorded ones."""
    global _CACHE
    with _LOCK:
        if _CACHE is None:
            merged = _read_json(_bundled_path())
            merged.update(_read_json(cache_path()))
            _CACHE = merged
        return _CACHE


def lookup(
    kernel: str, d: int, s: int, causal: bool, device: Optional[str] = None
) -> Optional[Tuple[int, int]]:
    """Returns a tuned ``(block_q, block_kv)`` or None. Never raises."""
    ent = _load().get(_key(kernel, d, s, causal, device))
    if not ent:
        return None
    return int(ent["block_q"]), int(ent["block_kv"])


def lookup_entry(
    kernel: str, d: int, s: int, causal: bool, device: Optional[str] = None
) -> Optional[dict]:
    """Full tuning entry (block fields + any extras such as
    ``heads_per_step`` for the decode space) or None. Never raises."""
    ent = _load().get(_key(kernel, d, s, causal, device))
    return dict(ent) if ent else None


def pow2_bucket(s: int) -> int:
    """NEAREST power-of-two bucket (geometric) for context-length keys:
    decode/gemv optima move with log2(size), not the exact value, so an
    entry recorded at 128K serves a 130K cache (128K + generation slack)
    rather than falling in the empty 256K bucket. Attention-kernel entries
    keep exact seq keys — prefill shapes are few and fixed per model."""
    if s <= 1:
        return 1
    hi = 1
    while hi < s:
        hi <<= 1
    lo = hi >> 1
    # geometric midpoint: s belongs to lo when s^2 < lo*hi
    return lo if s * s < lo * hi else hi


def record(
    kernel: str,
    d: int,
    s: int,
    causal: bool,
    block_q: int,
    block_kv: int,
    tflops: float = 0.0,
    device: Optional[str] = None,
    extra: Optional[dict] = None,
) -> str:
    """Persist a tuning entry; returns the cache path."""
    path = cache_path()
    entry = {
        "block_q": int(block_q),
        "block_kv": int(block_kv),
        "tflops": float(tflops),
    }
    if extra:
        entry.update(extra)
    with _LOCK:
        user = _read_json(path)
        user[_key(kernel, d, s, causal, device)] = entry
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(user, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        _load()[_key(kernel, d, s, causal, device)] = entry
    return path


def clear_memory_cache() -> None:
    """Drop the in-process copy (tests; pick up external edits)."""
    global _CACHE
    with _LOCK:
        _CACHE = None
