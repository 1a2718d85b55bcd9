"""Host batching: variable-length reads -> fixed-shape (B, L) code tensors.

The TPU analog of the reference's sequence iterator feeding FillPartitions
(SURVEY.md 3.1 HOT LOOP #1's input side).  Ragged reads are handled by
padding with an invalid code (so padded windows are masked out on device)
and by splitting long reads into L-length chunks with a (k-1)-base halo so
every window is seen exactly once (the sequence-parallel analog,
SURVEY.md section 5.7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from dsk_tpu.io.bank import Bank
from dsk_tpu.kmer.codec import encode_bytes

PAD = np.uint8(0xFF)  # invalid code: windows touching it are masked


@dataclass
class Batch:
    codes: np.ndarray     # (B, L) uint8, 0..3 valid, 0xFF pad/invalid
    bank_ids: np.ndarray  # (B,) int32 sub-bank index per row
    n_rows: int           # rows actually filled (rest are all-PAD)
    n_bases: int = 0      # input bases consumed by this batch (pre-chunking)
    n_reads: int = 0      # input reads consumed by this batch


def chunk_codes(codes: np.ndarray, k: int, row_len: int) -> list[np.ndarray]:
    """Split one encoded read into row_len chunks overlapping by k-1."""
    n = codes.shape[0]
    if n <= row_len:
        return [codes]
    step = row_len - (k - 1)
    out = []
    pos = 0
    while pos + k - 1 < n:
        out.append(codes[pos : pos + row_len])
        pos += step
    return out


def batch_iterator(
    bank: Bank,
    k: int,
    batch_rows: int = 1024,
    row_len: int = 256,
    use_native: bool | None = None,
) -> Iterator[Batch]:
    """Stream a bank as fixed-shape batches of encoded, chunked reads.

    Dispatches to the native C++ reader (dsk_tpu.io.native: gunzip + parse
    + encode + halo-chunk in one pass, the BankFasta replacement) when the
    shared library is available; the Python path is the tested fallback
    and produces byte-identical batches.
    """
    if row_len < k:
        raise ValueError(f"row_len {row_len} < k={k}")
    if use_native is None:
        from dsk_tpu.io import native

        use_native = native.available()
    if use_native:
        yield from _native_batch_iterator(bank, k, batch_rows, row_len)
        return
    buf = np.full((batch_rows, row_len), PAD, dtype=np.uint8)
    bids = np.zeros(batch_rows, dtype=np.int32)
    row = 0
    bases = 0
    reads = 0
    for bank_id, seq in bank.iter_sequences():
        # stats count ALL parsed input (reads shorter than k produce no
        # rows but are still consumed input — native parser semantics)
        bases += len(seq.data)
        reads += 1
        if len(seq.data) < k:
            continue
        codes = encode_bytes(seq.data)
        for chunk in chunk_codes(codes, k, row_len):
            buf[row, : chunk.shape[0]] = chunk
            bids[row] = bank_id
            row += 1
            if row == batch_rows:
                yield Batch(buf, bids, row, bases, reads)
                buf = np.full((batch_rows, row_len), PAD, dtype=np.uint8)
                bids = np.zeros(batch_rows, dtype=np.int32)
                row = 0
                bases = 0
                reads = 0
    if row > 0:
        yield Batch(buf, bids, row, bases, reads)


def _native_batch_iterator(
    bank: Bank, k: int, batch_rows: int, row_len: int
) -> Iterator[Batch]:
    """C++-backed batching: one NativeReader per sub-bank, shared buffers.

    Row/boundary semantics identical to the Python path (validated row-for-
    row in tests/test_native_io.py); rows from consecutive sub-banks can
    share a batch, with bank_ids labeling each row.
    """
    from dsk_tpu.io.native import NativeReader

    buf = np.full((batch_rows, row_len), PAD, dtype=np.uint8)
    bids = np.zeros(batch_rows, dtype=np.int32)
    row = 0
    bases = 0
    reads = 0
    for bank_id, path in enumerate(bank.files):
        reader = NativeReader(path)
        try:
            while True:
                n, b, r = reader.next_batch(buf[row:], k)
                if n == 0 and b == 0 and r == 0:
                    break
                bids[row : row + n] = bank_id
                row += n
                bases += b
                reads += r
                if row == batch_rows:
                    yield Batch(buf, bids, row, bases, reads)
                    buf = np.full((batch_rows, row_len), PAD, dtype=np.uint8)
                    bids = np.zeros(batch_rows, dtype=np.int32)
                    row = 0
                    bases = 0
                    reads = 0
        finally:
            reader.close()
    if row > 0:
        yield Batch(buf, bids, row, bases, reads)
