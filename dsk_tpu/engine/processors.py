"""Count-processor chain: histogram, solidity kinds, histo2D.

The TPU re-design of gatb-core's CountProcessor* chain (SURVEY.md C7):
instead of a virtual-dispatch chain consuming one (kmer, count) at a time,
the processors are vectorized transforms over the final count table
(total abundance + optional per-bank abundance matrix).

Solidity semantics (reference: -solidity-kind sum|min|max|one|all and
-solidity-custom, CHANGELOG.md:22; gatb CountProcessorSolidityFactory):

  sum   total abundance across banks in [min, max]
  min   min of per-bank abundances in [min, max]
  max   max of per-bank abundances in [min, max]
  one   at least one bank's abundance in [min, max]
  all   every bank's abundance in [min, max]
  custom  a 0/1 vector over banks: solid iff every bank marked 1 has its
          abundance in [min, max] and every bank marked 0 has abundance
          BELOW min ("kmers specific to a subset of the input files",
          CHANGELOG.md:22)
"""

from __future__ import annotations

import numpy as np

SOLIDITY_KINDS = ("sum", "min", "max", "one", "all", "custom")


def solidity_mask(
    counts: np.ndarray,
    kind: str = "sum",
    abundance_min: int = 2,
    abundance_max: int = 2**31 - 1,
    bank_counts: np.ndarray | None = None,
    custom: np.ndarray | list[int] | None = None,
) -> np.ndarray:
    """Boolean mask of solid kmers.

    counts: (n,) total abundance; bank_counts: (n, nb_banks) per-bank
    abundance (required for kinds other than 'sum' when nb_banks > 1).
    """
    lo, hi = abundance_min, abundance_max
    if kind == "sum" or bank_counts is None or bank_counts.shape[1] == 1:
        if kind == "custom" and custom is not None and bank_counts is not None:
            pass  # fall through to custom below even with one bank
        else:
            return (counts >= lo) & (counts <= hi)
    if kind == "min":
        m = bank_counts.min(axis=1)
        return (m >= lo) & (m <= hi)
    if kind == "max":
        m = bank_counts.max(axis=1)
        return (m >= lo) & (m <= hi)
    if kind == "one":
        in_range = (bank_counts >= lo) & (bank_counts <= hi)
        return in_range.any(axis=1)
    if kind == "all":
        in_range = (bank_counts >= lo) & (bank_counts <= hi)
        return in_range.all(axis=1)
    if kind == "custom":
        if custom is None:
            raise ValueError("-solidity-custom requires a 0/1 bank vector")
        sel = np.asarray(custom, dtype=bool)
        if sel.shape[0] != bank_counts.shape[1]:
            raise ValueError(
                f"custom vector has {sel.shape[0]} entries for "
                f"{bank_counts.shape[1]} banks"
            )
        in_range = (bank_counts >= lo) & (bank_counts <= hi)
        absent = bank_counts < lo
        return in_range[:, sel].all(axis=1) & absent[:, ~sel].all(axis=1)
    raise ValueError(f"unknown solidity kind {kind!r} (expected {SOLIDITY_KINDS})")


def histogram(counts: np.ndarray, nb_bins: int = 10000) -> np.ndarray:
    """Abundance histogram over ALL distinct kmers (index = abundance,
    clipped to nb_bins; index 0 unused).  Reference: 10,000-bin fixtures,
    bin 1 populated (SURVEY.md section 0)."""
    out = np.zeros(nb_bins + 1, dtype=np.int64)
    if counts.size:
        np.add.at(out, np.clip(counts, 1, nb_bins), 1)
    return out


def histo2d_matrix(
    bank_counts: np.ndarray, histo_max: int = 10000
) -> np.ndarray:
    """KAT-style joint spectrum (reference -histo2D, README.md:96-99).

    bank 0 = the assembly, banks 1.. = the read datasets (README: "give the
    assembly file as the first file of the list").  Returns a
    (histo_max + 2, 11) matrix M where M[r, c] = number of distinct kmers
    with read abundance r (row histo_max+1 accumulates r > histo_max) and
    assembly abundance min(c, 10).  Row 0 (kmers absent from the reads) is
    kept but not written by the text writer.
    """
    if bank_counts.ndim != 2 or bank_counts.shape[1] < 2:
        raise ValueError("histo2D needs >= 2 banks (assembly + reads)")
    asm = np.clip(bank_counts[:, 0], 0, 10)
    reads = bank_counts[:, 1:].sum(axis=1)
    reads = np.clip(reads, 0, histo_max + 1)
    out = np.zeros((histo_max + 2, 11), dtype=np.int64)
    np.add.at(out, (reads, asm), 1)
    return out
