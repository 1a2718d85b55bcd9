"""ctypes binding for the native IO library (libdskio.so).

Builds on first import if the shared library is missing (g++ -O3 -lz,
see Makefile).  Falls back silently: callers check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdskio.so")
_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.fx_open.restype = ctypes.c_void_p
    lib.fx_open.argtypes = [ctypes.c_char_p]
    lib.fx_close.argtypes = [ctypes.c_void_p]
    lib.fx_error.restype = ctypes.c_int
    lib.fx_error.argtypes = [ctypes.c_void_p]
    lib.fx_next_batch.restype = ctypes.c_int
    lib.fx_next_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeReader:
    """Streams one file as encoded (rows, row_len) code blocks."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libdskio.so unavailable")
        self._lib = lib
        self._h = lib.fx_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)

    def next_batch(
        self, buf: np.ndarray, k: int
    ) -> tuple[int, int, int]:
        """Fill rows of buf (rows, row_len) uint8; return (n_rows, bases, reads).

        n_rows == 0 means EOF.  Raises on parse errors.
        """
        rows, row_len = buf.shape
        bases = ctypes.c_long()
        reads = ctypes.c_long()
        n = self._lib.fx_next_batch(
            self._h,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            rows,
            row_len,
            k,
            ctypes.byref(bases),
            ctypes.byref(reads),
        )
        err = self._lib.fx_error(self._h)
        if err:
            raise ValueError(f"native parser error code {err}")
        return n, bases.value, reads.value

    def close(self) -> None:
        if self._h:
            self._lib.fx_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
