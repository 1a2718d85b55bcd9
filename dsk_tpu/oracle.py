"""Trusted host-side oracle k-mer counter.

A small dict-based exact counter implementing the full DSK semantics
(canonical A<C<T<G, split-at-invalid, per-bank counts).  It exists to
(a) validate the reference's golden fixtures independently and
(b) generate expected outputs for arbitrary small inputs so the device
pipeline can be property-tested (SURVEY.md section 4.5).

Never used on the hot path.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from dsk_tpu.io.bank import Bank, open_bank
from dsk_tpu.kmer import codec


def count_sequence(counts: dict[int, int], seq: bytes, k: int) -> None:
    codes = codec.encode_bytes(seq)
    vals, valid = codec.canonical_windows(codes, k)
    for v, ok in zip(vals, valid):
        if ok:
            counts[int(v)] += 1


def count_bank(bank: Bank | str, k: int) -> dict[int, int]:
    """Canonical k-mer -> total abundance over all sub-banks."""
    if isinstance(bank, str):
        bank = open_bank(bank)
    counts: dict[int, int] = defaultdict(int)
    for _bank_id, seq in bank.iter_sequences():
        count_sequence(counts, seq.data, k)
    return dict(counts)


def count_bank_per_bank(bank: Bank | str, k: int) -> dict[int, np.ndarray]:
    """Canonical k-mer -> per-sub-bank abundance vector (for solidity kinds / histo2D)."""
    if isinstance(bank, str):
        bank = open_bank(bank)
    nb = bank.nb_banks
    counts: dict[int, np.ndarray] = {}
    for bank_id, seq in bank.iter_sequences():
        codes = codec.encode_bytes(seq.data)
        vals, valid = codec.canonical_windows(codes, k)
        for v, ok in zip(vals, valid):
            if not ok:
                continue
            v = int(v)
            vec = counts.get(v)
            if vec is None:
                vec = np.zeros(nb, dtype=np.int64)
                counts[v] = vec
            vec[bank_id] += 1
    return counts


def histogram(counts: dict[int, int], nb_bins: int = 10000) -> np.ndarray:
    """Abundance histogram: hist[a] = #distinct canonical kmers with abundance a.

    Bins 1..nb_bins; abundances above nb_bins are clipped into the last bin
    (reference: 10,000-line fixtures test/k27.histo etc., SURVEY.md section 0).
    Returned array is indexed 1..nb_bins (index 0 unused, zero).
    """
    hist = np.zeros(nb_bins + 1, dtype=np.int64)
    for a in counts.values():
        hist[min(a, nb_bins)] += 1
    return hist


def solid_counts(
    counts: dict[int, int], abundance_min: int = 2, abundance_max: int = 2**31 - 1
) -> dict[int, int]:
    return {v: a for v, a in counts.items() if abundance_min <= a <= abundance_max}


def dump_text(counts: dict[int, int], k: int) -> list[str]:
    """Sorted "<KMER> <count>" lines (sorted by packed canonical value,
    i.e. by the A<C<T<G order — the normative comparison form; SURVEY.md 7.2-3)."""
    return [
        f"{codec.kmer_to_string(v, k)} {counts[v]}" for v in sorted(counts)
    ]


def write_histo_text(hist: np.ndarray, path: str) -> None:
    with open(path, "w") as f:
        for a in range(1, hist.shape[0]):
            f.write(f"{a}\t{int(hist[a])}\n")
