"""2-bit packed batch cache: multi-pass runs re-read this, not the FASTA.

The TPU analog of gatb BankBinary/BankConverterAlgorithm (SURVEY.md C11):
the reference converts text banks to a compact binary format so its
multi-pass loop doesn't re-gunzip/re-parse (doc/paper.tex:123).  Here the
cache stores the (rows, row_len) code batches post-chunking: 2-bit packed
bases + a validity bitmap + per-row bank ids, so later passes skip parse,
encode AND chunking — a cached pass is a straight mmap -> unpack -> device
stream.

Format (little-endian):
  header line: JSON {"magic": "dskbatch1", k, batch_rows, row_len} + "\n"
  per batch:
    u32 n_rows, u64 n_bases, u64 n_reads
    packed codes:   n_rows * ceil(row_len/4)  bytes (2 bits per base)
    validity bits:  n_rows * ceil(row_len/8)  bytes (1 = base valid)
    bank ids:       n_rows * 4 bytes int32
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

import numpy as np

from dsk_tpu.io.batch import PAD, Batch

_MAGIC = "dskbatch1"


class CacheBudgetExceeded(RuntimeError):
    """The 2-bit cache would exceed the -max-disk budget (the reference
    enforces a disk budget and picks n_iters from it, doc/paper.tex:66,
    README.md:130).  Multi-pass runs catch this and fall back to
    re-reading the input bank each pass (bounded disk, more parse time)."""


def _pack2(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(rows, L) uint8 codes -> (packed 2-bit, packed validity bits)."""
    rows, L = codes.shape
    valid = codes <= 3
    c = np.where(valid, codes, 0).astype(np.uint8)
    pad4 = (-L) % 4
    if pad4:
        c = np.pad(c, ((0, 0), (0, pad4)))
    c = c.reshape(rows, -1, 4)
    packed = (c[:, :, 0] << 6) | (c[:, :, 1] << 4) | (c[:, :, 2] << 2) | c[:, :, 3]
    vbits = np.packbits(valid, axis=1)
    return packed.astype(np.uint8), vbits


def _unpack2(packed: np.ndarray, vbits: np.ndarray, L: int) -> np.ndarray:
    rows = packed.shape[0]
    c = np.empty((rows, packed.shape[1], 4), dtype=np.uint8)
    c[:, :, 0] = packed >> 6
    c[:, :, 1] = (packed >> 4) & 3
    c[:, :, 2] = (packed >> 2) & 3
    c[:, :, 3] = packed & 3
    c = c.reshape(rows, -1)[:, :L]
    valid = np.unpackbits(vbits, axis=1)[:, :L].astype(bool)
    return np.where(valid, c, PAD).astype(np.uint8)


class BatchCacheWriter:
    def __init__(
        self,
        path: str,
        k: int,
        batch_rows: int,
        row_len: int,
        max_bytes: int | None = None,
    ):
        self.path = path
        self.max_bytes = max_bytes
        self.bytes_written = 0
        self._f = open(path, "wb")
        self._f.write(
            (json.dumps(
                {"magic": _MAGIC, "k": k, "batch_rows": batch_rows,
                 "row_len": row_len}
            ) + "\n").encode()
        )

    def append(self, batch: Batch) -> None:
        packed, vbits = _pack2(batch.codes[: batch.n_rows])
        bids = np.ascontiguousarray(
            batch.bank_ids[: batch.n_rows], dtype=np.int32
        ).tobytes()
        nbytes = 20 + packed.nbytes + vbits.nbytes + len(bids)
        if (
            self.max_bytes is not None
            and self.bytes_written + nbytes > self.max_bytes
        ):
            raise CacheBudgetExceeded(
                f"batch cache would exceed the disk budget "
                f"({self.max_bytes >> 20} MB): falling back to re-reading "
                f"the input each pass"
            )
        self._f.write(
            struct.pack("<IQQ", batch.n_rows, batch.n_bases, batch.n_reads)
        )
        self._f.write(packed.tobytes())
        self._f.write(vbits.tobytes())
        self._f.write(bids)
        self.bytes_written += nbytes

    def close(self) -> None:
        self._f.close()

    def abort(self) -> None:
        """Stop caching and reclaim the disk (budget fallback)."""
        try:
            self._f.close()
        finally:
            if os.path.exists(self.path):
                os.unlink(self.path)


def read_batches(path: str) -> Iterator[Batch]:
    """Stream cached batches (shapes restored to (batch_rows, row_len))."""
    with open(path, "rb") as f:
        header = json.loads(f.readline())
        if header.get("magic") != _MAGIC:
            raise ValueError(f"{path}: not a dsk_tpu batch cache")
        rows_full = header["batch_rows"]
        L = header["row_len"]
        pb = (L + 3) // 4
        vb = (L + 7) // 8
        while True:
            head = f.read(20)
            if len(head) < 20:
                return
            n_rows, n_bases, n_reads = struct.unpack("<IQQ", head)
            packed = np.frombuffer(f.read(n_rows * pb), dtype=np.uint8)
            vbits = np.frombuffer(f.read(n_rows * vb), dtype=np.uint8)
            bids = np.frombuffer(f.read(n_rows * 4), dtype=np.int32)
            codes = _unpack2(
                packed.reshape(n_rows, pb), vbits.reshape(n_rows, vb), L
            )
            if n_rows < rows_full:
                full = np.full((rows_full, L), PAD, dtype=np.uint8)
                full[:n_rows] = codes
                codes = full
                b = np.zeros(rows_full, dtype=np.int32)
                b[:n_rows] = bids
                bids = b
            yield Batch(codes, np.ascontiguousarray(bids), n_rows,
                        int(n_bases), int(n_reads))


def teeing_iterator(batches, writer: BatchCacheWriter) -> Iterator[Batch]:
    """Yield batches while writing them to the cache (pass 0 of multi-pass).

    If the cache hits its disk budget (or the disk itself fills), caching
    is ABORTED — the partial file is deleted, writer.aborted is set, and
    the stream continues uncached; later passes then re-read the bank."""
    writer.aborted = False
    for batch in batches:
        if not writer.aborted:
            try:
                writer.append(batch)
            except (CacheBudgetExceeded, OSError):
                writer.abort()
                writer.aborted = True
        yield batch
    if not writer.aborted:
        writer.close()
