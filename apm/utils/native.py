"""ctypes binding for the native corpus-I/O library (native/apmio.cpp).

Build with ``python -m apm.utils.native`` (or ``make -C native``); if the
shared library is absent everything degrades to the NumPy fallback paths in
:mod:`apm.utils.io`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libapmio.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def build(verbose: bool = False) -> str:
    """Compile native/apmio.cpp into libapmio.so. Returns the library path."""
    src = os.path.join(_NATIVE_DIR, "apmio.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", _LIB_PATH]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "apmio.cpp")
        if os.path.exists(src):
            try:
                build()
            except Exception:
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.apmio_file_size.argtypes = [ctypes.c_char_p]
    lib.apmio_file_size.restype = ctypes.c_int64
    lib.apmio_read_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.apmio_read_file.restype = ctypes.c_int64
    lib.apmio_read_range.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.apmio_read_range.restype = ctypes.c_int32
    lib.apmio_fold.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.apmio_fold.restype = ctypes.c_int32
    lib.apmio_read_folded.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.apmio_read_folded.restype = ctypes.c_int32
    lib.apmio_banded_count.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.apmio_banded_count.restype = ctypes.c_int32
    lib.apmio_hash.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.apmio_hash.restype = ctypes.c_uint64
    lib.apmio_hash_par.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.apmio_hash_par.restype = ctypes.c_uint64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_file(path: str) -> np.ndarray:
    """Whole-file raw slurp via the native mmap loader."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native apmio library not available")
    size = lib.apmio_file_size(path.encode())
    if size < 0:
        raise FileNotFoundError(path)
    out = np.empty(size, dtype=np.uint8)
    got = lib.apmio_read_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size
    )
    if got != size:
        raise IOError(f"short read from {path}: {got} != {size}")
    return out


def read_range(path: str, start: int, length: int) -> np.ndarray:
    """Read bytes [start, start+length), zero-filled past EOF.

    The per-host halo-shard feeder: each host reads only its own overlapping
    byte range (never gathers the corpus).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native apmio library not available")
    out = np.empty(length, dtype=np.uint8)
    rc = lib.apmio_read_range(
        path.encode(), start, length, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    if rc != 0:
        raise IOError(f"apmio_read_range failed for {path} [{start}, {start + length})")
    return out


def fold(buf: np.ndarray, offset: int, n_rows: int, wf: int, halo: int) -> np.ndarray:
    """Stage ``buf`` into folded ``(n_rows, wf + halo)`` rows (see apmio_fold)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native apmio library not available")
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    out = np.empty((n_rows, wf + halo), dtype=np.uint8)
    rc = lib.apmio_fold(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(buf),
        offset,
        n_rows,
        wf,
        halo,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError("apmio_fold failed")
    return out


def read_folded(path: str, offset: int, n_rows: int, wf: int, halo: int) -> np.ndarray:
    """Read folded staging rows straight from a file (no whole-file slurp)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native apmio library not available")
    out = np.empty((n_rows, wf + halo), dtype=np.uint8)
    rc = lib.apmio_read_folded(
        path.encode(),
        offset,
        n_rows,
        wf,
        halo,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"apmio_read_folded failed for {path}")
    return out


def banded_count(
    text: np.ndarray,
    pattern: np.ndarray,
    k: int,
    n_windows: int,
    truncate_at: int = -1,
) -> int:
    """Count windows j in [0, n_windows) with banded distance <= k.

    ``truncate_at >= 0`` enables the reference's EOF prefix truncation with
    ``size = min(m, truncate_at - j)`` (pass the corpus byte count when the
    text IS the corpus suffix). Semantics identical to
    ``apm.utils.oracle.banded_distances`` (tested against it).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native apmio library not available")
    text = np.ascontiguousarray(text, dtype=np.uint8)
    pattern = np.ascontiguousarray(pattern, dtype=np.uint8)
    out = ctypes.c_int64(0)
    rc = lib.apmio_banded_count(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(text),
        pattern.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(pattern),
        k,
        n_windows,
        truncate_at,
        ctypes.byref(out),
    )
    if rc != 0:
        raise ValueError("apmio_banded_count failed")
    return int(out.value)


def hash_bytes(buf: np.ndarray) -> int:
    """Full-content 64-bit hash (MurmurHash64A mixing).

    Large buffers are hashed in parallel stripes (the hash gates the
    device-corpus cache probe, so it sits on every cached scan's critical
    path); the ctypes call releases the GIL for the duration.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native apmio library not available")
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    threads = min(16, os.cpu_count() or 1)
    return int(
        lib.apmio_hash_par(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(buf),
            threads,
        )
    )


if __name__ == "__main__":
    print(build(verbose=True))
