"""ctypes bindings for the native data-loading core (fastload.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; every entry point has a NumPy fallback so the package works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastload.cpp")
_LIB = os.path.join(_HERE, "libfastload.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None

        lib.sw_parse_table.restype = ctypes.c_int
        lib.sw_parse_table.argtypes = [
            ctypes.c_char_p, ctypes.c_char,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.sw_window_count.restype = ctypes.c_int64
        lib.sw_window_count.argtypes = [
            ctypes.POINTER(ctypes.c_int64)] * 2 + [ctypes.c_int64] * 6
        lib.sw_window_fill.restype = ctypes.c_int
        lib.sw_window_fill.argtypes = (
            [ctypes.POINTER(ctypes.c_int64)] * 2 + [ctypes.c_int64] * 6
            + [ctypes.POINTER(ctypes.c_int64), ctypes.c_int64])
        lib.sw_free.restype = None
        lib.sw_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def parse_table(path: str, delim: str = "") -> np.ndarray:
    """Parse a numeric text table to [rows, cols] float64.  Native when
    available; np.loadtxt-style fallback otherwise."""
    lib = get_lib()
    if lib is not None:
        data_p = ctypes.POINTER(ctypes.c_double)()
        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        rc = lib.sw_parse_table(path.encode(), (delim or "\0").encode()[:1],
                                ctypes.byref(data_p), ctypes.byref(rows),
                                ctypes.byref(cols))
        if rc == 0:
            n = rows.value * cols.value
            out = np.ctypeslib.as_array(data_p, shape=(n,)).copy() \
                if n else np.zeros((0,))
            lib.sw_free(data_p)
            return out.reshape(rows.value, max(cols.value, 1))
        if rc == -1:
            raise ValueError(f"No such file or directory: {path}")
    # fallback: tolerant python parse
    rows_out: List[List[float]] = []
    ncols = -1
    with open(path) as fh:
        for line in fh:
            toks = line.split(delim) if delim else line.split()
            try:
                vals = [float(t) for t in toks if t.strip()]
            except ValueError:
                continue
            if not vals:
                continue
            if ncols < 0:
                ncols = len(vals)
            if len(vals) != ncols:
                continue
            rows_out.append(vals)
    return np.asarray(rows_out, dtype=np.float64).reshape(len(rows_out),
                                                          max(ncols, 1))


def window_indices(t_data: List[np.ndarray], t_start: int, t_stop: int,
                   step: int, n_past: int, n_next: int) -> np.ndarray:
    """Sliding-window hits [(agent, kp, k0, kf, t), ...] — native core with
    a NumPy fallback (same enumeration order: anchor-major, then agent)."""
    lib = get_lib()
    times = np.concatenate([np.asarray(t, np.int64) for t in t_data]) \
        if t_data else np.zeros((0,), np.int64)
    offsets = np.zeros(len(t_data) + 1, np.int64)
    np.cumsum([len(t) for t in t_data], out=offsets[1:])

    if lib is not None:
        tp = times.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        op = offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        n = lib.sw_window_count(tp, op, len(t_data), t_start, t_stop, step,
                                n_past, n_next)
        out = np.zeros((n, 5), np.int64)
        rc = lib.sw_window_fill(tp, op, len(t_data), t_start, t_stop, step,
                                n_past, n_next,
                                out.ctypes.data_as(
                                    ctypes.POINTER(ctypes.c_int64)), n)
        if rc == 0:
            return out
    # fallback
    hits = []
    index = [{int(v): k for k, v in enumerate(t)} for t in t_data]
    for t in range(t_start, t_stop):
        for a, idx in enumerate(index):
            k0 = idx.get(t)
            kp = idx.get(t - step * n_past)
            kf = idx.get(t + step * (n_next - 1))
            if k0 is None or kp is None or kf is None:
                continue
            hits.append((a, kp, k0, kf, t))
    return np.asarray(hits, np.int64).reshape(len(hits), 5)
