"""Host-side native runtime: bit packing, quantization, KV page allocator.

Backed by the C++ extension ``_lowbit_host`` (csrc/lowbit_host.cpp) when
built (``python setup.py build_ext --inplace``); transparently falls back to
numpy otherwise. ``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

try:
    from lowbit_quant_fa2_paddle_tpu.host import _lowbit_host as _native

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build
    _native = None
    HAVE_NATIVE = False


def pack_int4(codes: np.ndarray) -> np.ndarray:
    """int8 codes [rows, d] -> packed [rows, d/2] (halves-of-D nibbles,
    identical layout to ops/quant.py:quant_int4)."""
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    rows, d = codes.shape
    if _native is not None:
        raw = _native.pack_int4(codes)
        return np.frombuffer(raw, dtype=np.int8).reshape(rows, d // 2).copy()
    lo = codes[:, : d // 2].astype(np.int32) & 0xF
    hi = codes[:, d // 2 :].astype(np.int32) & 0xF
    return (lo | (hi << 4)).astype(np.int8)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    packed = np.ascontiguousarray(packed, dtype=np.int8)
    rows, dp = packed.shape
    if _native is not None:
        raw = _native.unpack_int4(packed)
        return np.frombuffer(raw, dtype=np.int8).reshape(rows, dp * 2).copy()
    p = packed.astype(np.int32)
    lo = ((p << 28) >> 28).astype(np.int8)
    hi = (p >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=1)


def quant_int8_per_token(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """float32 [rows, d] -> (int8 codes, f32 scales[rows]); same math as the
    Pallas per-token quantizer (abs-max/127 + 1e-7, round half away)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    rows, d = x.shape
    if _native is not None:
        codes_raw, scales_raw = _native.quant_int8_per_token(x)
        codes = np.frombuffer(codes_raw, dtype=np.int8).reshape(rows, d).copy()
        scales = np.frombuffer(scales_raw, dtype=np.float32).copy()
        return codes, scales
    amax = np.abs(x).max(axis=1)
    scales = amax / 127.0 + 1e-7
    v = x / scales[:, None]
    codes = np.clip(np.sign(v) * np.floor(np.abs(v) + 0.5), -127, 127).astype(np.int8)
    return codes, scales.astype(np.float32)


class PageAllocator:
    """Free-list page allocator for paged KV caches (vLLM-style block
    manager; the serving-runtime piece around ops/decode.py's paged path)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        if _native is not None:
            self._h = _native.allocator_new(num_pages)
        else:
            self._h = None
            self._free: List[int] = list(range(num_pages - 1, -1, -1))
            self._seqs: List[List[int]] = []
            self._free_slots: List[int] = []

    def new_seq(self) -> int:
        if self._h is not None:
            return _native.allocator_new_seq(self._h)
        if self._free_slots:
            sid = self._free_slots.pop()
            self._seqs[sid] = []
            return sid
        self._seqs.append([])
        return len(self._seqs) - 1

    def append_page(self, sid: int) -> int:
        if self._h is not None:
            return _native.allocator_append_page(self._h, sid)
        if not self._free:
            raise MemoryError("out of KV pages")
        page = self._free.pop()
        self._seqs[sid].append(page)
        return page

    def free_seq(self, sid: int) -> None:
        if self._h is not None:
            _native.allocator_free_seq(self._h, sid)
            return
        self._free.extend(self._seqs[sid])
        self._seqs[sid] = []
        self._free_slots.append(sid)

    def seq_pages(self, sid: int) -> List[int]:
        if self._h is not None:
            return _native.allocator_seq_pages(self._h, sid)
        return list(self._seqs[sid])

    def stats(self) -> dict:
        if self._h is not None:
            return _native.allocator_stats(self._h)
        return {
            "num_pages": self.num_pages,
            "free_pages": len(self._free),
            "num_seqs": len(self._seqs) - len(self._free_slots),
        }
