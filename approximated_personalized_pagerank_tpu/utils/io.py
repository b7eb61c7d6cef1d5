"""Edge-list CSV parsing.

Mirrors the reference driver's importGraph input format (src/main.cc:78-112):
one ``node1,node2`` integer pair per line, tolerant of ``\\r\\n`` endings.
A native C++ parser (native/ingest.cc, loaded via ctypes) is used when built;
otherwise a vectorized numpy fallback parses the whole file without a Python
per-line loop.
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    """Load the C++ ingest shared library if it has been built."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libppr_native.so")
    if not os.path.exists(path):
        # Build on demand when a toolchain is available (cheap, one file).
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path), "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.ppr_parse_edge_csv.restype = ctypes.c_longlong
            lib.ppr_parse_edge_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.c_longlong,
            ]
            lib.ppr_bfs_bipartition.restype = None
            lib.ppr_bfs_bipartition.argtypes = [
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _NATIVE = lib
        except OSError:
            _NATIVE = None
    return _NATIVE


def native_bfs_bipartition(indptr, indices, cindptr, cindices):
    """2-coloring via the native BFS; returns None if the lib is missing."""
    lib = _native_lib()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    color = np.empty(n, dtype=np.uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.ppr_bfs_bipartition(
        n,
        np.ascontiguousarray(indptr, dtype=np.int32).ctypes.data_as(i32),
        np.ascontiguousarray(indices, dtype=np.int32).ctypes.data_as(i32),
        np.ascontiguousarray(cindptr, dtype=np.int32).ctypes.data_as(i32),
        np.ascontiguousarray(cindices, dtype=np.int32).ctypes.data_as(i32),
        color.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return color


def parse_edge_csv(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse ``n1,n2`` lines into (src, dst) int64 arrays (duplicates kept).

    ``.gz`` paths are decompressed in memory (the bundled Eat dataset ships
    gzipped, data/eat.csv.gz) and parsed with the vectorized numpy path.
    """
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as f:
            return _parse_bytes(f.read(), path)
    lib = _native_lib()
    if lib is not None:
        return _parse_native(lib, path)
    return _parse_numpy(path)


def _parse_native(lib, path: str) -> Tuple[np.ndarray, np.ndarray]:
    size = os.path.getsize(path)
    # Upper bound on edges: one per ~4 bytes of file ("a,b\n").
    cap = max(size // 3 + 16, 16)
    buf = np.empty(2 * cap, dtype=np.int64)
    n = lib.ppr_parse_edge_csv(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        cap,
    )
    if n < 0:
        raise IOError(f"native CSV parse failed for {path!r} (code {n})")
    pairs = buf[: 2 * n].reshape(n, 2)
    return pairs[:, 0].copy(), pairs[:, 1].copy()


def _parse_numpy(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    return _parse_bytes(data, path)


def _parse_bytes(data: bytes, path: str) -> Tuple[np.ndarray, np.ndarray]:
    if not data:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # Normalize separators so the file is one stream of integers:
    # commas and CR become whitespace, then a single split handles the rest.
    table = bytes.maketrans(b",\r", b"  ")
    vals = np.array(data.translate(table).split(), dtype=np.int64)
    if vals.size % 2 != 0:
        raise ValueError(f"{path!r}: odd number of integers in edge CSV")
    pairs = vals.reshape(-1, 2)
    return pairs[:, 0].copy(), pairs[:, 1].copy()
