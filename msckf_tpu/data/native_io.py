"""ctypes bindings for the native host-runtime library (fastcsv.cpp).

Fast mmap'd numeric CSV parsing and sensor-block packing. The library is
compiled on first use (g++ is part of the environment); every entry point has
a NumPy/pandas fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_DIR, "libfastcsv.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return _lib
    lib.csv_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.csv_dims.restype = ctypes.c_int
    lib.csv_read.argtypes = [
        ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.csv_read.restype = ctypes.c_int64
    lib.pack_blocks.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.pack_blocks.restype = ctypes.c_int
    lib.csv_read_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_char,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.csv_read_many.restype = ctypes.c_int
    _lib = lib
    return _lib


def have_native() -> bool:
    return bool(_load())


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def read_numeric_csv(path: str, sep: str = ",") -> np.ndarray:
    """Numeric CSV (one header line) -> (rows, cols) float64 array."""
    lib = _load()
    if not lib:
        import pandas as pd

        return pd.read_csv(path, sep=sep).to_numpy(dtype=np.float64)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.csv_dims(path.encode(), sep.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"csv_dims failed for {path}")
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    got = lib.csv_read(path.encode(), sep.encode(), _dptr(out), rows.value, cols.value)
    if got != rows.value:
        raise IOError(f"csv_read parsed {got}/{rows.value} rows of {path}")
    return out


def read_numeric_csvs(paths, sep: str = ",", threads: int | None = None):
    """Parse many numeric CSVs concurrently (native thread pool).

    The multi-sequence feeder for the batched runner: python-side pandas
    loads serialize on the GIL; the native pool parses one mmap'd file per
    thread. Falls back to a serial loop without the toolchain. Returns a
    list of (rows, cols) float64 arrays in input order.
    """
    lib = _load()
    if not lib:
        return [read_numeric_csv(p, sep) for p in paths]
    n = len(paths)
    if n == 0:
        return []
    if threads is None:
        threads = min(n, os.cpu_count() or 1)
    dims = []
    for p in paths:
        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        rc = lib.csv_dims(p.encode(), sep.encode(), ctypes.byref(rows), ctypes.byref(cols))
        if rc != 0:
            raise IOError(f"csv_dims failed for {p}")
        dims.append((rows.value, cols.value))
    outs = [np.empty(d, dtype=np.float64) for d in dims]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_double) * n)(*[_dptr(a) for a in outs])
    c_rows = (ctypes.c_int64 * n)(*[d[0] for d in dims])
    c_cols = (ctypes.c_int64 * n)(*[d[1] for d in dims])
    rc = lib.csv_read_many(c_paths, sep.encode(), c_outs, c_rows, c_cols, n, threads)
    if rc != 0:
        raise IOError("csv_read_many: a file failed to parse completely")
    return outs


def pack_blocks_native(
    imu_ts: np.ndarray,
    gyro: np.ndarray,
    acc: np.ndarray,
    cam_ticks: np.ndarray,
    block: int,
):
    """IMU ticks -> (C, B) frame blocks; native with a NumPy fallback."""
    C = len(cam_ticks)
    ts = np.zeros((C, block), np.float64)
    g = np.zeros((C, block, 3), np.float64)
    a = np.zeros((C, block, 3), np.float64)
    valid = np.zeros((C, block), np.uint8)
    lib = _load()
    imu_ts = np.ascontiguousarray(imu_ts, np.float64)
    gyro = np.ascontiguousarray(gyro, np.float64)
    acc = np.ascontiguousarray(acc, np.float64)
    cam_ticks = np.ascontiguousarray(cam_ticks, np.int64)
    if lib:
        rc = lib.pack_blocks(
            _dptr(imu_ts), _dptr(gyro), _dptr(acc), len(imu_ts),
            cam_ticks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), C, block,
            _dptr(ts), _dptr(g), _dptr(a),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise ValueError("pack_blocks: block size too small for a frame gap")
        return ts, g, a, valid.astype(bool)
    bounds = np.append(cam_ticks, len(imu_ts))
    for j in range(C):
        lo, hi = int(bounds[j]), int(bounds[j + 1])
        n = hi - lo
        if n > block:
            raise ValueError("pack_blocks: block size too small for a frame gap")
        ts[j, :n] = imu_ts[lo:hi]
        g[j, :n] = gyro[lo:hi]
        a[j, :n] = acc[lo:hi]
        valid[j, :n] = 1
    return ts, g, a, valid.astype(bool)
