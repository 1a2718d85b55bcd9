"""Streaming FASTA/FASTQ parser (plain or gzip).

Replaces the reference's BankFasta (gatb-core bank/impl/BankFasta.cpp,
SURVEY.md C9): FASTA with multi-line sequences and '>' headers, FASTQ with
'@'/'+' records and quality lines, transparent gzip via the OS zlib.

The default implementation is Python over large decoded chunks (the regex-free
splitline scan is adequate for tests); the native C++ parser in
dsk_tpu.io.native (when built) is used automatically for the hot path.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass
from typing import Iterator


@dataclass
class Sequence:
    """One read: raw ASCII bases (not yet 2-bit encoded) + header comment."""

    comment: bytes
    data: bytes
    quality: bytes | None = None


def _open_maybe_gzip(path: str) -> io.BufferedReader:
    f = open(path, "rb")
    magic = f.peek(2)[:2] if hasattr(f, "peek") else f.read(2)
    if magic == b"\x1f\x8b":
        f.seek(0)
        return gzip.open(f, "rb")  # type: ignore[return-value]
    f.seek(0)
    return f


def sniff_format(path: str) -> str:
    """Return 'fasta' | 'fastq' by peeking at the first non-empty line."""
    with _open_maybe_gzip(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                return "fasta"
            if line.startswith(b"@"):
                return "fastq"
            raise ValueError(f"{path}: not FASTA/FASTQ (first line {line[:20]!r})")
    return "fasta"  # empty file: an empty bank, not an error (native parity)


def iter_sequences(
    path: str, start: int = 0, end: int | None = None
) -> Iterator[Sequence]:
    """Stream records; optionally only those whose header byte offset lies
    in [start, end) (plain files only — gzip has no random access).

    Mirrors the native reader's byte-range contract (fx_open_range in
    io/native/fastx.cpp): resync to the next record boundary after
    `start`; a record starting at or past `end` belongs to the next shard.
    """
    fmt = sniff_format(path)
    if start == 0 and end is None:
        with _open_maybe_gzip(path) as f:
            if fmt == "fasta":
                yield from _iter_fasta(f)
            else:
                yield from _iter_fastq(f)
        return
    f = _open_maybe_gzip(path)
    try:
        if isinstance(f, gzip.GzipFile):
            raise ValueError(f"{path}: gzip files cannot be byte-range split")
        off = _resync(f, start, fmt)
        if off is None or (end is not None and off >= end):
            return
        f.seek(off)
        if fmt == "fasta":
            yield from _iter_fasta_range(f, off, end)
        else:
            yield from _iter_fastq_range(f, off, end)
    finally:
        f.close()


def _resync(f, start: int, fmt: str) -> int | None:
    """First record-header offset >= start (None if no record follows)."""
    if start == 0:
        return 0
    f.seek(start - 1)
    prev = f.read(1)
    off = start
    if prev != b"\n":
        line = f.readline()  # skip the partial line start landed inside
        if not line:
            return None
        off = start + len(line)
    f.seek(off)
    while True:
        line = f.readline()
        if not line:
            return None
        if fmt == "fasta":
            if line.startswith(b">"):
                return off
        elif line.startswith(b"@"):
            # a quality line may start with '@' too; a true header has a
            # '+' line two lines ahead (see fastx.cpp resync_to_record)
            o1 = off + len(line)
            l1 = f.readline()
            if not l1:
                return None
            l2 = f.readline()
            if not l2:
                return None
            if l2.startswith(b"+"):
                return off
            off = o1
            f.seek(off)
            continue
        off += len(line)


def _iter_fasta_range(f, off: int, end: int | None) -> Iterator[Sequence]:
    comment = None
    parts: list[bytes] = []
    while True:
        line = f.readline()
        if not line:
            break
        if line.startswith(b">"):
            if end is not None and off >= end:
                break
            if comment is not None:
                yield Sequence(comment, b"".join(parts))
            comment = line.rstrip(b"\r\n")[1:]
            parts = []
        else:
            stripped = line.rstrip(b"\r\n")
            if stripped:
                parts.append(stripped)
        off += len(line)
    if comment is not None:
        yield Sequence(comment, b"".join(parts))


def _iter_fastq_range(f, off: int, end: int | None) -> Iterator[Sequence]:
    while True:
        header = f.readline()
        if not header:
            return
        if not header.rstrip(b"\r\n"):
            off += len(header)
            continue
        if end is not None and off >= end:
            return
        if not header.startswith(b"@"):
            raise ValueError(f"bad FASTQ record header: {header[:30]!r}")
        seq = f.readline()
        plus = f.readline()
        if not plus.startswith(b"+"):
            raise ValueError("bad FASTQ record: missing '+' line")
        qual = f.readline()
        off += len(header) + len(seq) + len(plus) + len(qual)
        yield Sequence(
            header.rstrip(b"\r\n")[1:],
            seq.rstrip(b"\r\n"),
            qual.rstrip(b"\r\n"),
        )


def _iter_fasta(f) -> Iterator[Sequence]:
    comment = None
    parts: list[bytes] = []
    for line in f:
        line = line.rstrip(b"\r\n")
        if line.startswith(b">"):
            if comment is not None:
                yield Sequence(comment, b"".join(parts))
            comment = line[1:]
            parts = []
        elif line:
            parts.append(line)
    if comment is not None:
        yield Sequence(comment, b"".join(parts))


def _iter_fastq(f) -> Iterator[Sequence]:
    while True:
        header = f.readline()
        if not header:
            return
        header = header.rstrip(b"\r\n")
        if not header:
            continue
        if not header.startswith(b"@"):
            raise ValueError(f"bad FASTQ record header: {header[:30]!r}")
        seq = f.readline().rstrip(b"\r\n")
        plus = f.readline()
        if not plus.startswith(b"+"):
            raise ValueError("bad FASTQ record: missing '+' line")
        qual = f.readline().rstrip(b"\r\n")
        yield Sequence(header[1:], seq, qual)


def estimate_bases(path: str, sample_bytes: int = 1 << 22) -> tuple[int, float]:
    """Cheap estimate of (total_bases, mean_read_len) for the planner.

    Parses up to sample_bytes of decoded data and extrapolates by the
    compressed-size ratio (the reference's IBank::estimate analog, used by
    its ConfigurationAlgorithm; SURVEY.md C5).
    """
    file_size = os.path.getsize(path)
    n_bases = 0
    n_reads = 0
    consumed = 0
    with _open_maybe_gzip(path) as f:
        is_gz = isinstance(f, gzip.GzipFile)
        fmt = None
        first = f.readline()
        fmt = "fasta" if first.startswith(b">") else "fastq"
        f.seek(0)
        it = _iter_fasta(f) if fmt == "fasta" else _iter_fastq(f)
        for seq in it:
            n_bases += len(seq.data)
            n_reads += 1
            consumed += len(seq.data) + len(seq.comment) + 2
            if consumed >= sample_bytes:
                break
        if is_gz:
            try:
                raw_pos = f.fileobj.tell()  # compressed bytes consumed
            except Exception:
                raw_pos = None
            if consumed >= sample_bytes and raw_pos:
                scale = file_size / max(raw_pos, 1)
                n_bases = int(n_bases * scale)
                n_reads = max(1, int(n_reads * scale))
        else:
            if consumed >= sample_bytes:
                scale = file_size / max(consumed, 1)
                n_bases = int(n_bases * scale)
                n_reads = max(1, int(n_reads * scale))
    mean_len = n_bases / max(n_reads, 1)
    return n_bases, mean_len
