"""ctypes loader for the native batch-gather (csrc/fast_gather.c).

Compiles the C source on first use into a per-user cache directory (the
image bans pip installs but ships cc/g++), loads it via ctypes, and exposes
:func:`gather_rows`. Falls back to a numpy loop transparently if no compiler
is available, so the pure-Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("Native")

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "fast_gather.c")


def _build_lib() -> Optional[str]:
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "deepearth_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, "libfastgather.so")
    src_mtime = os.path.getmtime(_SRC)
    if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= src_mtime:
        return lib_path
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-pthread", _SRC,
                 "-o", lib_path],
                check=True, capture_output=True, timeout=60,
            )
            logger.info(f"built native gather with {cc} → {lib_path}")
            return lib_path
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired) as e:
            logger.debug(f"{cc} build failed: {e}")
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _build_lib()
        if path is None:
            logger.info("no C compiler; using numpy gather fallback")
            return None
        lib = ctypes.CDLL(path)
        lib.gather_rows.argtypes = [
            ctypes.c_void_p,  # base
            ctypes.POINTER(ctypes.c_int64),  # offsets
            ctypes.c_int,  # n
            ctypes.c_int64,  # row_bytes
            ctypes.c_void_p,  # out
            ctypes.c_int,  # n_threads
        ]
        lib.gather_rows.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:
        logger.warning(f"native gather unavailable: {e}")
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def gather_rows(
    mmap_arr: np.memmap,
    byte_offsets: np.ndarray,
    row_bytes: int,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Gather rows from a memory-mapped blob into one contiguous buffer.

    Args:
        mmap_arr: 1-D np.memmap over the blob (any dtype).
        byte_offsets: (N,) int64 byte offsets of each row start.
        row_bytes: bytes per row.

    Returns:
        (N, row_bytes) uint8 array (caller views/reshapes to the real dtype).
    """
    n = len(byte_offsets)
    if out is None:
        out = np.empty((n, row_bytes), dtype=np.uint8)
    assert out.flags["C_CONTIGUOUS"] and out.nbytes == n * row_bytes
    lib = _load()
    offs = np.ascontiguousarray(byte_offsets, dtype=np.int64)
    if lib is not None:
        base = mmap_arr.ctypes.data_as(ctypes.c_void_p)
        lib.gather_rows(
            base,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int(n),
            ctypes.c_int64(row_bytes),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int(n_threads),
        )
        return out
    # numpy fallback
    raw = mmap_arr.view(np.uint8)
    for i, off in enumerate(offs):
        out[i] = raw[off : off + row_bytes]
    return out
