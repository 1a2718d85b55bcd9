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


def iter_sequences(path: str) -> Iterator[Sequence]:
    fmt = sniff_format(path)
    with _open_maybe_gzip(path) as f:
        if fmt == "fasta":
            yield from _iter_fasta(f)
        else:
            yield from _iter_fastq(f)


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
