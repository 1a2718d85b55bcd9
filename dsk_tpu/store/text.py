"""Text output writers: ascii dump, .histo, .histo2D.

The dsk2ascii / -histo / -histo2D output surface of the reference
(utils/dsk2ascii.cpp:77-107; README.md:90-99).
"""

from __future__ import annotations

from typing import Iterable, TextIO

import numpy as np

from dsk_tpu.kmer import codec
from dsk_tpu.store.hdf5 import OutputStore


def dump_ascii(
    store: OutputStore,
    out: TextIO,
    fasta: bool = False,
    fastq: bool = False,
) -> int:
    """Write '<KMER> <count>' lines (dsk2ascii parity, utils/dsk2ascii.cpp:104).

    fasta mode writes '>' header lines, fastq mode '@'/'+' records with a
    dummy quality, matching dsk2ascii's -fasta/-fastq shapes
    (utils/dsk2ascii.cpp:88-101).  Returns number of kmers written.
    """
    k = store.kmer_size
    n = 0
    for value, abundance in store.iter_items():
        s = codec.kmer_to_string(value, k)
        if fasta:
            out.write(f">{n}__{abundance}\n{s}\n")
        elif fastq:
            out.write(f"@{n}__{abundance}\n{s}\n+\n{'!' * k}\n")
        else:
            out.write(f"{s} {abundance}\n")
        n += 1
    return n


def write_histo(hist: np.ndarray, out: TextIO) -> None:
    """'<abundance>\\t<count>' per bin 1..nb_bins (the -histo text file fed to
    plot-histo.R; fixture format of test/k27.histo)."""
    for a in range(1, hist.shape[0]):
        out.write(f"{a}\t{int(hist[a])}\n")


def write_histo2d(matrix: np.ndarray, out: TextIO) -> None:
    """-histo2D matrix: one line per read-dataset abundance r (1..max+1,
    last row = all abundances above max), 11 count columns for assembly
    abundance 0..10 (format consumed by utils/plot-histo2D.R:22-24)."""
    for r in range(1, matrix.shape[0]):
        cols = " ".join(str(int(c)) for c in matrix[r])
        out.write(f"{r} {cols}\n")


def sorted_dump_lines(items: Iterable[tuple[int, int]], k: int) -> list[str]:
    """Normative comparison form: lines sorted by packed canonical value
    (the A<C<T<G order) — partition-count-independent (SURVEY.md 7.2-3)."""
    return [
        f"{codec.kmer_to_string(v, k)} {a}" for v, a in sorted(items)
    ]
