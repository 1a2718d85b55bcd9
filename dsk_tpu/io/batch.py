"""Host batching: variable-length reads -> fixed-shape (B, L) code tensors.

The TPU analog of the reference's sequence iterator feeding FillPartitions
(SURVEY.md 3.1 HOT LOOP #1's input side).  Ragged reads are handled by
padding with an invalid code (so padded windows are masked out on device)
and by splitting long reads into L-length chunks with a (k-1)-base halo so
every window is seen exactly once (the sequence-parallel analog,
SURVEY.md section 5.7).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from dsk_tpu.io.bank import Bank
from dsk_tpu.kmer.codec import encode_bytes

PAD = np.uint8(0xFF)  # invalid code: windows touching it are masked

# Soft per-row invalid-EVENT cap: the sparse "exc" wire format
# (io/packed.py EXC_E) encodes at most this many invalid positions per
# row, so row packing closes a row before exceeding it (separators
# between packed reads + in-read N's).  A single chunk with more
# internal invalids still exceeds it — that rare case rides the
# engine's WireOverflow -> bitmap retry valve.  Must match the native
# parser's EVENT_CAP (fastx.cpp; row-level lockstep tests).
ROW_EVENT_CAP = 16


@dataclass(frozen=True)
class ReadUnit:
    """One independently parsable shard of input: a whole file, or a byte
    range [start, end) of a plain (non-gzip) file with record resync.

    The work unit for reader parallelism (the reference fans its bank
    iterator over -nb-cores threads, SURVEY.md C13/P3) and for multi-host
    input sharding (SURVEY.md §2.4).
    """

    path: str
    bank_id: int
    start: int = 0
    end: int = -1  # -1: to EOF


def _is_gzip(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"\x1f\x8b"


MIN_SPLIT_BYTES = 4 << 20


def split_bank_units(
    bank: Bank, n_units: int, min_bytes: int = MIN_SPLIT_BYTES
) -> list[ReadUnit]:
    """Split a bank into ~n_units independently parsable ReadUnits.

    Plain FASTA/FASTQ files are split by byte ranges (resynced to record
    boundaries by the readers); gzip members stay whole (no random
    access).  Unit count is best-effort: small files don't split below
    min_bytes per unit.
    """
    sizes = [os.path.getsize(p) for p in bank.files]
    total = sum(sizes) or 1
    units: list[ReadUnit] = []
    for bank_id, (path, size) in enumerate(zip(bank.files, sizes)):
        if _is_gzip(path) or size <= min_bytes:
            units.append(ReadUnit(path, bank_id))
            continue
        share = max(1, round(n_units * size / total))
        n = min(share, max(1, size // min_bytes))
        step = size // n
        for i in range(n):
            start = i * step
            end = (i + 1) * step if i < n - 1 else -1
            units.append(ReadUnit(path, bank_id, start, end))
    return units


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


def subdivide_units(
    units: list[ReadUnit], n_units: int, min_bytes: int = MIN_SPLIT_BYTES
) -> list[ReadUnit]:
    """Split plain-file ReadUnits further by byte range (gz units and tiny
    ranges stay whole) — reader parallelism within a pre-sharded bank."""
    sized = []
    for u in units:
        end = u.end if u.end >= 0 else os.path.getsize(u.path)
        sized.append((u, end - u.start))
    total = sum(s for _, s in sized) or 1
    out: list[ReadUnit] = []
    for u, size in sized:
        if _is_gzip(u.path) or size <= min_bytes:
            out.append(u)
            continue
        share = max(1, round(n_units * size / total))
        n = min(share, max(1, size // min_bytes))
        step = size // n
        for i in range(n):
            start = u.start + i * step
            end = u.start + (i + 1) * step if i < n - 1 else u.end
            out.append(ReadUnit(u.path, u.bank_id, start, end))
    return out


def batch_iterator(
    bank: Bank,
    k: int,
    batch_rows: int = 1024,
    row_len: int = 256,
    use_native: bool | None = None,
    n_workers: int = 1,
) -> Iterator[Batch]:
    """Stream a bank as fixed-shape batches of encoded, chunked reads.

    Dispatches to the native C++ reader (dsk_tpu.io.native: gunzip + parse
    + encode + halo-chunk in one pass, the BankFasta replacement) when the
    shared library is available; the Python path is the tested fallback
    and produces byte-identical batches.  n_workers > 1 fans parsing over
    threads (the reference's -nb-cores Dispatcher, SURVEY.md C13) —
    batch ORDER is then nondeterministic but counting is order-invariant.
    """
    if row_len < k:
        raise ValueError(f"row_len {row_len} < k={k}")
    if use_native is None:
        from dsk_tpu.io import native

        use_native = native.available()
    if n_workers > 1:
        yield from parallel_batch_iterator(
            bank, k, batch_rows, row_len, n_workers, use_native=use_native
        )
        return
    units = getattr(bank, "units", None) or [
        ReadUnit(p, i) for i, p in enumerate(bank.files)
    ]
    yield from _units_batch_stream(
        units, k, batch_rows, row_len, use_native,
        global_ids=getattr(bank, "global_ids", None),
    )


def _units_batch_stream(
    units: list[ReadUnit],
    k: int,
    batch_rows: int,
    row_len: int,
    use_native: bool,
    global_ids: list[int] | None = None,
) -> Iterator[Batch]:
    """Serial batching over ReadUnits with one shared buffer.

    Row/boundary semantics identical between the native and Python paths
    (validated row-for-row in tests/test_native_io.py); rows from
    consecutive units can share a batch, with bank_ids labeling each row.
    global_ids (multi-host sharded banks) remaps local file index ->
    original bank id.
    """
    buf = np.full((batch_rows, row_len), PAD, dtype=np.uint8)
    bids = np.zeros(batch_rows, dtype=np.int32)
    row = 0
    bases = 0
    reads = 0
    for unit in units:
        bank_id = (
            global_ids[unit.bank_id] if global_ids is not None
            else unit.bank_id
        )
        if use_native:
            from dsk_tpu.io.native import NativeReader

            reader = NativeReader(unit.path, unit.start, unit.end)
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
                        buf = np.full(
                            (batch_rows, row_len), PAD, dtype=np.uint8
                        )
                        bids = np.zeros(batch_rows, dtype=np.int32)
                        row = 0
                        bases = 0
                        reads = 0
            finally:
                reader.close()
        else:
            from dsk_tpu.io.fasta import iter_sequences

            # short reads PACK into shared rows separated by one PAD code
            # (split-at-invalid keeps windows exact); col is the open-row
            # cursor.  Packing rules mirror the native parser exactly
            # (fastx.cpp emit_chunk): continuation chunks of long reads
            # take full rows, open rows close when the next read doesn't
            # fit, at batch yields, and at unit end.
            col = 0
            ev = 0  # invalid events in the open row (ROW_EVENT_CAP)
            end = None if unit.end < 0 else unit.end
            for seq in iter_sequences(unit.path, unit.start, end):
                # stats count ALL parsed input (reads shorter than k
                # produce no rows but are still consumed input)
                bases += len(seq.data)
                reads += 1
                if len(seq.data) < k:
                    continue
                codes = encode_bytes(seq.data)
                chunks = chunk_codes(codes, k, row_len)
                for ci, chunk in enumerate(chunks):
                    m = chunk.shape[0]
                    is_final = ci == len(chunks) - 1
                    # event budget applies to PACKED (final) chunks only;
                    # continuation chunks take whole rows (as in C++)
                    c_inv = int((chunk > 3).sum()) if is_final else 0
                    if not is_final or (
                        col > 0
                        and (col + 1 + m > row_len
                             or ev + 1 + c_inv > ROW_EVENT_CAP)
                    ):
                        if col > 0:
                            row += 1
                            col = 0
                        ev = 0
                    if row == batch_rows:
                        yield Batch(buf, bids, row, bases, reads)
                        buf = np.full(
                            (batch_rows, row_len), PAD, dtype=np.uint8
                        )
                        bids = np.zeros(batch_rows, dtype=np.int32)
                        row = 0
                        bases = 0
                        reads = 0
                    at = 0 if col == 0 else col + 1
                    buf[row, at : at + m] = chunk
                    bids[row] = bank_id
                    ev = c_inv if at == 0 else ev + 1 + c_inv
                    if is_final:
                        col = at + m
                        if col >= row_len:
                            row += 1
                            col = 0
                            ev = 0
                    else:
                        row += 1
                        col = 0
                        ev = 0
            if col > 0:  # close the open row at unit end
                row += 1
                col = 0
            if row == batch_rows:
                yield Batch(buf, bids, row, bases, reads)
                buf = np.full((batch_rows, row_len), PAD, dtype=np.uint8)
                bids = np.zeros(batch_rows, dtype=np.int32)
                row = 0
                bases = 0
                reads = 0
    if row > 0:
        yield Batch(buf, bids, row, bases, reads)


def parallel_batch_iterator(
    bank: Bank,
    k: int,
    batch_rows: int = 1024,
    row_len: int = 256,
    n_workers: int = 4,
    use_native: bool | None = None,
    queue_depth: int = 8,
) -> Iterator[Batch]:
    """Fan parsing over n_workers threads (the -nb-cores Dispatcher analog).

    The bank is split into ReadUnits (plain files by byte range with
    record resync, gzip files whole — gunzip is inherently serial per
    member) dealt round-robin to workers; each worker streams its units
    through _units_batch_stream into its OWN bounded queue, and the
    consumer merges the queues round-robin (w0.b0, w1.b0, ..., w0.b1,
    ...; exhausted workers drop out of the rotation).  The native parser
    releases the GIL inside ctypes calls, so workers genuinely overlap —
    the per-worker queues buffer ahead of the merge point, so the
    round-robin costs head-of-line blocking only when a worker is
    queue_depth batches slower than its peers.

    Batch order is therefore DETERMINISTIC for a fixed (bank, k,
    batch_rows, row_len, n_workers): the work-preserving overflow retry
    (dist.engine count_stream resume_state) depends on this to skip
    exactly the batches a snapshot already consumed.  Counting itself is
    order-invariant and per-row bank_ids keep multi-bank semantics exact.
    """
    import queue as _queue
    import threading

    if use_native is None:
        from dsk_tpu.io import native

        use_native = native.available()
    preset = getattr(bank, "units", None)
    if preset is not None:
        units = subdivide_units(preset, n_units=n_workers * 4)
    else:
        units = split_bank_units(bank, n_units=n_workers * 4)
    n_workers = max(1, min(n_workers, len(units)))
    global_ids = getattr(bank, "global_ids", None)

    errs: list[BaseException] = []
    _DONE = object()

    def worker(worker_units: list[ReadUnit], q: _queue.Queue):
        try:
            for b in _units_batch_stream(
                worker_units, k, batch_rows, row_len, use_native,
                global_ids=global_ids,
            ):
                q.put(b)
        except BaseException as e:
            errs.append(e)
        finally:
            q.put(_DONE)

    queues: list[_queue.Queue] = []
    threads = []
    for w in range(n_workers):
        q: _queue.Queue = _queue.Queue(maxsize=max(1, queue_depth))
        worker_units = units[w::n_workers]
        t = threading.Thread(
            target=worker, args=(worker_units, q), daemon=True
        )
        t.start()
        queues.append(q)
        threads.append(t)
    live = list(queues)
    while live:
        for q in list(live):
            item = q.get()
            if item is _DONE:
                live.remove(q)
                continue
            yield item
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
