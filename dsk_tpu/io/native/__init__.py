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
_HAS_PACK_EXC = False


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "fastx.cpp")
    stale = not os.path.exists(_SO) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_SO)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            if not os.path.exists(_SO):
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
    lib.fx_open_range.restype = ctypes.c_void_p
    lib.fx_open_range.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
    ]
    lib.fx_pack_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    global _HAS_PACK_EXC
    try:  # stale .so from before the exc wire format: numpy fallback
        lib.fx_pack_batch_exc.restype = ctypes.c_int
        lib.fx_pack_batch_exc.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint16),
        ]
        _HAS_PACK_EXC = True
    except AttributeError:
        _HAS_PACK_EXC = False
    _lib = lib
    return lib


def pack_batch(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """C packer for the device wire format (io/packed.py layout); returns
    None when the library is unavailable (caller falls back to numpy).
    ~10x the numpy pack on the prefetch thread's hot path."""
    lib = _load()
    if lib is None:
        return None
    rows, row_len = codes.shape
    nb = -(-row_len // 32)
    words = np.empty((rows, nb * 2), np.uint32)
    bitmap = np.empty((rows, nb), np.uint32)
    codes = np.ascontiguousarray(codes, np.uint8)
    lib.fx_pack_batch(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows,
        row_len,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        bitmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return words, bitmap


def pack_batch_exc(
    codes: np.ndarray, E: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """C packer for the sparse "exc" wire format (io/packed.py
    pack_codes_exc layout); returns None when the library (or a stale
    .so without the symbol) is unavailable — caller falls back to numpy.
    Raises WireOverflow when any row has more than E invalid events."""
    lib = _load()
    if lib is None or not _HAS_PACK_EXC:
        return None
    rows, row_len = codes.shape
    if row_len >= 0xFFFF:
        raise ValueError(
            f"exc wire format needs row_len < 65535, got {row_len}"
        )
    nb = -(-row_len // 32)
    words = np.empty((rows, nb * 2), np.uint32)
    meta = np.empty((rows, 1 + E), np.uint16)
    codes = np.ascontiguousarray(codes, np.uint8)
    worst = lib.fx_pack_batch_exc(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows,
        row_len,
        E,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if worst > E:
        from dsk_tpu.io.packed import WireOverflow

        raise WireOverflow(
            f"row with {worst} invalid positions exceeds the exc wire "
            f"format's E={E} slots"
        )
    return words, meta


def available() -> bool:
    return _load() is not None


class NativeReader:
    """Streams one file (or a byte range of a plain file) as encoded
    (rows, row_len) code blocks.

    start/end select records whose header byte offset is in [start, end)
    (end < 0: to EOF) with resync to the next record boundary — the
    reference has no analog (single-process); this is the shard unit for
    reader parallelism and multi-host input sharding (SURVEY.md §2.4).
    Gzip files cannot be range-split (no random access): pass whole files.
    """

    def __init__(self, path: str, start: int = 0, end: int = -1):
        lib = _load()
        if lib is None:
            raise RuntimeError("libdskio.so unavailable")
        self._lib = lib
        if start == 0 and end < 0:
            self._h = lib.fx_open(path.encode())
        else:
            from dsk_tpu.io.fasta import sniff_format

            fq = 1 if sniff_format(path) == "fastq" else 0
            self._h = lib.fx_open_range(path.encode(), start, end, fq)
        if not self._h:
            raise FileNotFoundError(
                f"{path} (range [{start},{end}) — gz files cannot be split)"
                if start or end >= 0 else path
            )

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
