"""Dataset registry + loaders (reference inferenceKit basedataset.py:
GSM8K/MATH/simple loaders). Zero-egress environment: loaders read local
JSONL files in the GSM8K convention (``{"question": ..., "answer": ...}``,
final numeric answer after ``####``), plus a built-in synthetic arithmetic
set for self-contained tests."""

from __future__ import annotations

import json
import random
from typing import Callable, Dict, List, Tuple

Example = Dict[str, str]
DATASETS: Dict[str, Callable[..., List[Example]]] = {}


def register(name: str):
    def deco(fn):
        DATASETS[name] = fn
        return fn

    return deco


@register("jsonl")
def load_jsonl(path: str, limit: int = 0) -> List[Example]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(json.loads(line))
            if limit and len(out) >= limit:
                break
    return out


@register("gsm8k")
def load_gsm8k(path: str, limit: int = 0) -> List[Example]:
    """GSM8K-format JSONL: answer's final number follows '####'."""
    return load_jsonl(path, limit)


@register("simple")
def load_simple(n: int = 32, seed: int = 0, **_) -> List[Example]:
    """Synthetic arithmetic QA (the reference's 'simple' dataset role)."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        a, b = rng.randint(1, 99), rng.randint(1, 99)
        out.append(
            {"question": f"What is {a} + {b}?", "answer": f"#### {a + b}"}
        )
    return out


def load_dataset(name: str, **kw) -> List[Example]:
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASETS)}")
    return DATASETS[name](**kw)
