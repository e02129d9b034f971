"""ctypes binding for the native exact-search oracle (cpu_oracle.cpp).

The reference's `cpu/cpu_baseline.cpp` is a standalone binary; here the
native oracle is a shared library compiled on first use and driven from
Python, with a NumPy fallback when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["oracle_search", "native_available", "build_library", "build_binary"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpu_oracle.cpp")
_MAIN_SRC = os.path.join(_HERE, "cpu_oracle_main.cpp")
_LIB = os.path.join(_HERE, "libcpu_oracle.so")
_BIN = os.path.join(_HERE, "cpu_oracle")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def build_library(force: bool = False) -> str | None:
    """Compile cpu_oracle.cpp → libcpu_oracle.so. Returns the path or None."""
    if not os.path.exists(_SRC):
        # Source-less install (e.g. a packaged wheel): use a prebuilt .so
        # if present, else signal the NumPy fallback.
        return _LIB if os.path.exists(_LIB) else None
    if os.path.exists(_LIB) and not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fopenmp", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        # Retry without OpenMP (toolchains missing libgomp).
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            return _LIB
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None


def build_binary(force: bool = False) -> str | None:
    """Compile the standalone ``cpu_oracle`` CLI binary (the reference's
    cpu_baseline executable with its documented argv contract).  Returns
    the path or None."""
    if (
        os.path.exists(_BIN)
        and not force
        and os.path.getmtime(_BIN) >= max(os.path.getmtime(_SRC), os.path.getmtime(_MAIN_SRC))
    ):
        return _BIN
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fopenmp",
        _MAIN_SRC, _SRC, "-o", _BIN,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _BIN
    except (subprocess.CalledProcessError, FileNotFoundError):
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            return _BIN
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = build_library()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.oracle_search.restype = ctypes.c_int
        lib.oracle_search.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        try:
            lib.oracle_abi_version.restype = ctypes.c_int
            abi = lib.oracle_abi_version()
        except AttributeError:
            abi = -1  # pre-ABI-tag .so: stale by definition
        if abi != 1:
            _build_failed = True
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _numpy_fallback(queries, base, k, metric, query_chunk: int = 512):
    """Chunked exact search: bounded memory (a full [Q, N] score matrix is
    40 GB at 10K x 1M — the chunk keeps it to query_chunk rows)."""
    ids_out = np.empty((queries.shape[0], k), np.int32)
    scores_out = np.empty((queries.shape[0], k), np.float32)
    base_norms = (np.sum(base.astype(np.float32) ** 2, axis=1)[None, :]
                  if metric == "l2" else None)
    for q0 in range(0, queries.shape[0], query_chunk):
        scores = queries[q0:q0 + query_chunk] @ base.T
        if base_norms is not None:
            scores = 2.0 * scores - base_norms
        order = np.lexsort(
            (np.broadcast_to(np.arange(base.shape[0]), scores.shape), -scores),
            axis=1,
        )
        ids = order[:, :k].astype(np.int32)
        ids_out[q0:q0 + query_chunk] = ids
        scores_out[q0:q0 + query_chunk] = np.take_along_axis(
            scores, ids, axis=1).astype(np.float32)
    return ids_out, scores_out


def oracle_search(
    queries: np.ndarray, base: np.ndarray, k: int, metric: str = "ip"
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k via the native oracle → (ids [Q,k] i32, scores [Q,k] f32).

    Scores follow the unified larger-is-better convention
    (ip: q·b; l2: -(‖b‖²-2q·b)).
    """
    if metric not in ("ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    base = np.ascontiguousarray(base, dtype=np.float32)
    nq, d = queries.shape
    n, d2 = base.shape
    if d != d2:
        raise ValueError(f"dim mismatch: queries {d} vs base {d2}")
    k = int(k)
    if not (0 < k <= n):
        raise ValueError(f"k={k} out of range (1..{n})")

    lib = _load()
    if lib is None:
        return _numpy_fallback(queries, base, k, metric)

    ids = np.empty((nq, k), dtype=np.int32)
    scores = np.empty((nq, k), dtype=np.float32)
    rc = lib.oracle_search(
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nq,
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d,
        k, 0 if metric == "ip" else 1,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"oracle_search failed with code {rc}")
    return ids, scores
