"""ctypes bindings for the native host-runtime library (native/).

Loads native/libhyrise_native.so when present (build with `make -C native`);
every function has a numpy fallback so the engine works without a compiled
library. Used by parallel/partition.py (ingest routing) and available to
loaders.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "libhyrise_native.so")
    if not os.path.exists(path):
        # try building it once (g++ is in the image)
        try:
            import subprocess
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           capture_output=True, timeout=120)
        except Exception:
            pass
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.hash_partition_i64.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.radix_histogram.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        lib.radix_scatter.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.parse_text_column.restype = ctypes.c_int64
        lib.parse_text_column.argtypes = [
            ctypes.c_char_p, ctypes.c_char, ctypes.c_int32, ctypes.c_char,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        _LIB = lib
    return _LIB


def have_native() -> bool:
    return _lib() is not None


def hash_partition(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard targets for int keys; matches exchange.partition_hash."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    lib = _lib()
    if lib is not None:
        out = np.empty(len(keys), dtype=np.int32)
        lib.hash_partition_i64(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(keys), n_shards,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(1)) % np.uint64(n_shards)).astype(np.int32)


def radix_route(targets: np.ndarray, n_shards: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """(histogram, stable row order grouped by shard)."""
    targets = np.ascontiguousarray(targets, dtype=np.int32)
    lib = _lib()
    if lib is not None:
        hist = np.empty(n_shards, dtype=np.int64)
        lib.radix_histogram(
            targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(targets), n_shards,
            hist.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        offsets = np.concatenate([[0], np.cumsum(hist)[:-1]])
        order = np.empty(len(targets), dtype=np.int64)
        lib.radix_scatter(
            targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(targets), n_shards,
            np.ascontiguousarray(offsets, dtype=np.int64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return hist, order
    hist = np.bincount(targets, minlength=n_shards).astype(np.int64)
    order = np.argsort(targets, kind="stable").astype(np.int64)
    return hist, order


def parse_text_column(path: str, sep: str, col_idx: int, kind: str,
                      skip_rows: int, max_rows: int) -> Optional[np.ndarray]:
    """Native single-pass numeric column extraction from a text table;
    returns None when the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    dtype = np.int64 if kind == "l" else np.float64
    out = np.empty(max_rows, dtype=dtype)
    n = lib.parse_text_column(path.encode(), sep.encode(), col_idx,
                              kind.encode(), skip_rows,
                              out.ctypes.data_as(ctypes.c_void_p), max_rows)
    if n < 0:
        return None
    return out[:n]
