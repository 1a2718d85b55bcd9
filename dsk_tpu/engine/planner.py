"""Resource planner: input estimate -> passes / table capacity / batching.

The TPU re-design of gatb ConfigurationAlgorithm (SURVEY.md C5).  The
reference picks n_iters (passes) and n_partitions from estimated kmer
volume vs -max-memory/-max-disk (doc/paper.tex:66-67:
n_iters = ceil(v*b/D), n_p = ceil(v(b+32)/(0.7 n_iters M)), with
machine RAM/disk auto-detected, doc/human_log:3-4).

Here the budget is device memory (HBM for the distinct-kmer table + sort
scratch).  The number of distinct kmers is estimated by counting a small
SAMPLE of the bank (the analog of the reference's sampling-based
repartition, SURVEY.md C6) and extrapolating linearly — an overestimate
for high-coverage data, which errs toward more passes (safe).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from dsk_tpu.io.bank import Bank, open_bank
from dsk_tpu.kmer import codec

# Bytes of device memory consumed per table slot during a merge flush:
# (W words + count) * 4 bytes, times a scratch factor for lax.sort's
# operand copies (keys + payload, double-buffered).
SORT_SCRATCH_FACTOR = 6
TABLE_FILL_TARGET = 0.8  # plan tables at 80% occupancy (hash-split jitter)
MAX_TABLE_SLOTS = 1 << 25  # per-chip table ceiling: prefer passes beyond it


@dataclass
class ResourcePlan:
    n_passes: int
    table_cap: int       # per chip, per pass (slots)
    flush_items: int     # pending windows before a merge flush
    buf_batches: int     # mesh-engine flush cadence (buffer ~ table size)
    batch_rows: int
    row_len: int
    est_bases: int
    est_distinct: int
    est_distinct_per_pass: int

    def as_properties(self) -> dict:
        return {
            "nb_passes": self.n_passes,
            "table_cap": self.table_cap,
            "flush_items": self.flush_items,
            "buf_batches": self.buf_batches,
            "est_bases": self.est_bases,
            "est_distinct_kmers": self.est_distinct,
        }


def sample_distinct_estimate(
    bank: Bank, k: int, total_windows: int, sample_bases: int = 2 << 20
) -> int:
    """Estimate total distinct kmers from a two-point prefix sample.

    Plain linear extrapolation of distinct/window from a small sample
    wildly overestimates for high-coverage data (the distinct curve
    saturates).  Two estimators run on the nested prefixes and the
    TIGHTER one wins (the linear-marginal one is an upper bound, so the
    min stays safe):

    - marginal rate: new-kmer rate at the end of the sample, linearly
      extrapolated (x1.2).  Still overestimates — for coverage data the
      rate keeps decaying after the sample — measured ~2x on a 50x
      synthetic bank, which doubles table_cap and the flush sort.
    - coverage fit: d(w) = G(1 - exp(-w/G)) + eps*w.  The saturating
      term is uniform coverage of an underlying genome of G distinct
      kmers; the linear term is the floor of NOVEL kmers per window
      (sequencing errors), which never saturates.  Solved for (G, eps)
      from the two sample points; a 1.15 safety factor covers fit and
      thinning noise.  Overflowing anyway is recoverable: the engine's
      typed-overflow auto-retry re-plans with more passes.

    Runs on the host CPU backend: planning must never pay TPU (remote)
    compiles before the real engine is even built.
    """
    s1, d1, s2, d2 = _host_distinct_two_point(bank, k, sample_bases)
    if s2 <= s1:  # sample covered the whole input: exact
        return d2
    marginal = (d2 - d1) / max(s2 - s1, 1)
    est = d2 + marginal * max(0, total_windows - s2) * 1.2
    fit = _coverage_fit_estimate(s1, d1, s2, d2, total_windows)
    if fit is not None:
        est = min(est, fit * 1.15)
    return int(min(max(est, d2), total_windows))


def _coverage_fit_estimate(
    s1: int, d1: int, s2: int, d2: int, total: int
) -> float | None:
    """d(total) under d(w) = G(1-exp(-w/G)) + eps*w fitted to
    (s1, d1), (s2, d2).  None when the points don't constrain the model
    (degenerate sample, or no G >= d2 fits with eps >= 0)."""
    if d2 <= 0 or d1 <= 0 or d2 < d1:
        return None

    def resid(G: float) -> tuple[float, float]:
        eps = (d2 - G * (1.0 - np.exp(-s2 / G))) / s2
        return G * (1.0 - np.exp(-s1 / G)) + eps * s1 - d1, eps

    # G sweep: log grid from "everything saturates" to "nothing does".
    # Two sample points often under-constrain G (in the linear regime
    # every large G fits equally well but extrapolates differently), so
    # among all CREDIBLE fits take the LARGEST extrapolation — the safe
    # direction; the caller still min()s against the marginal-linear
    # upper bound.
    grid = np.geomspace(max(d2 / 2.0, 1.0), max(total * 64.0, 2.0), 96)
    best = None
    for G in grid:
        r, eps = resid(float(G))
        if eps < -0.01 * d2 / s2:  # saturating term overshoots d2
            continue
        if abs(r) > 0.02 * d1:  # doesn't pass through the first point
            continue
        est = G * (1.0 - np.exp(-total / G)) + max(eps, 0.0) * total
        if best is None or est > best:
            best = est
    return best


def _host_distinct_two_point(
    bank: Bank, k: int, limit_bases: int
) -> tuple[int, int, int, int]:
    """(windows_half, distinct_half, windows_full, distinct_full) of a bank
    prefix, host numpy.

    All sampled reads are concatenated with a single invalid separator
    (split-at-invalid semantics make windows never cross reads) so the
    whole sample is ONE vectorized canonical_windows sweep; the half-point
    measurement is a slice of the same arrays.  k > 32 shrinks the sample
    (the codec's multi-word path is python-int; estimates don't need
    scale).
    """
    parts: list[np.ndarray] = []
    sep = np.array([0xFF], dtype=np.uint8)
    seen = 0
    from dsk_tpu.io import native

    if native.available():
        # the native reader parses ~100x faster than the python path; rows
        # are (k-1)-halo chunks — windows on halos are seen twice, which
        # biases the two-point rate by < overlap fraction (irrelevant for
        # a capacity estimate)
        from dsk_tpu.io.batch import batch_iterator

        for batch in batch_iterator(bank, max(k, 2), 256, 4096):
            rows = batch.codes[: batch.n_rows]
            parts.append(
                np.concatenate(
                    [rows, np.full((rows.shape[0], 1), 0xFF, np.uint8)],
                    axis=1,
                ).reshape(-1)
            )
            seen += int(batch.n_bases)
            if seen >= limit_bases:
                break
    else:
        for _bank_id, seq in bank.iter_sequences():
            codes = codec.encode_bytes(seq.data)
            parts.append(codes)
            parts.append(sep)
            seen += codes.shape[0]
            if seen >= limit_bases:
                break
    if not parts:
        return 0, 0, 0, 0
    total = int(sum(p.shape[0] for p in parts))
    if total < k:
        return 0, 0, 0, 0
    half_bound = total // 2

    # Sweep PER PART (parts never share windows: each ends in a 0xFF
    # separator) with canonical-invariant 64-bit hash keys: any k in
    # O(log k) u64 passes, and a bounded working set that reuses heap
    # pages (fresh page faults run ~100 MB/s on this VM class — a single
    # full-sample sweep measured 38-57 s in round 2; see utils.hostmem).
    # Distinct counts use hash THINNING: every distinct key survives
    # keys < 2^64/factor with probability 1/factor independent of its
    # multiplicity, so distinct_total ~ factor * distinct(thinned) —
    # unbiased, ~1/sqrt(kept) relative error (factor sized for >= 64k
    # kept keys).  Exact (factor=1) below 4M sample windows, where tests
    # and tiny inputs live.
    factor = 1
    while factor < 4096 and (total >> 16) > factor * 4:
        factor *= 2
    thresh = np.uint64((1 << 64) - 1) // np.uint64(factor)
    def sweep(part: np.ndarray, off: int):
        keys, okv = codec.hash_canonical_windows(part, k)
        in_half = np.arange(okv.shape[0], dtype=np.int64) < half_bound - off
        # window counts stay EXACT (they are the marginal-rate
        # denominators); only the distinct sets are thinned
        wf = int(okv.sum())
        wh = int((okv & in_half).sum())
        sel = okv if factor == 1 else okv & (keys <= thresh)
        return wf, wh, keys[sel], keys[sel & in_half]

    offsets = np.concatenate(
        [[0], np.cumsum([p.shape[0] for p in parts])]
    )[:-1]
    todo = [
        (part, int(off))
        for part, off in zip(parts, offsets)
        if part.shape[0] >= k
    ]
    # numpy ufuncs drop the GIL: fan the sweeps over a small thread pool
    from concurrent.futures import ThreadPoolExecutor

    n_threads = min(4, max(1, (os.cpu_count() or 1)), len(todo) or 1)
    with ThreadPoolExecutor(n_threads) as ex:
        results = list(ex.map(lambda a: sweep(*a), todo))
    if not results:
        return 0, 0, 0, 0
    win_full = sum(r[0] for r in results)
    win_half = sum(r[1] for r in results)
    kept_full = [r[2] for r in results]
    kept_half = [r[3] for r in results]
    d_half = int(np.unique(np.concatenate(kept_half)).shape[0]) * factor
    d_full = int(np.unique(np.concatenate(kept_full)).shape[0]) * factor
    return win_half, d_half, win_full, d_full


def _round_capacity(x: int) -> int:
    """Round a slot count up to the {2^n, 3*2^(n-1)} grid (>= 2^16).

    Pure pow2 rounding over-provisions up to 2x — the flush sorts
    (buffer + table) rows, so table slack is paid on EVERY flush.  The
    half-step grid caps the waste at 33% while keeping the set of
    compiled program shapes small (compiles through the axon tunnel run
    minutes; the persistent cache is per-shape).  Every point is a
    multiple of 2^15, so bucketized flushes (capb = cap/S) and lane
    tiling stay exact."""
    x = max(int(x), 1 << 16)
    n = int(np.ceil(np.log2(x)))
    for cand in (3 << (n - 2), 1 << n):
        if cand >= x:
            return cand
    return 1 << (n + 1)  # unreachable (2^n >= x by construction)


def plan_resources(
    bank: Bank | str,
    k: int,
    max_memory_mb: int = 5000,
    n_chips: int = 1,
    batch_rows: int = 0,
    row_len: int = 0,
    sample: bool = True,
) -> ResourcePlan:
    """batch_rows/row_len == 0: auto-size the batch geometry.  Rows are
    read chunks, so row_len tracks the MEAN READ LENGTH (a fixed 256 for
    100 bp reads wastes ~60% of window slots as padding); batch_rows then
    targets ~2M windows per batch on TPU (the axon tunnel costs ~6.5 ms
    per dispatch — big fused batches keep the pipeline compute-bound)."""
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()  # sampling sweeps allocate ~100 MB temps; see hostmem
    if isinstance(bank, str):
        bank = open_bank(bank)
    W = codec.words_per_kmer(k)
    est_bases, mean_len = bank.estimate()

    if row_len <= 0:
        want = int(min(max(mean_len, 1), 1000)) + k
        row_len = 1 << int(np.ceil(np.log2(max(want, 128))))
        row_len = int(np.clip(row_len, 128, 1024))
    if batch_rows <= 0:
        try:
            import jax

            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        target_windows = (2 << 20) if on_tpu else (1 << 18)
        nw0 = max(row_len - k + 1, 1)
        batch_rows = int(np.clip(round(target_windows / nw0), 256, 8192))
        batch_rows = -(-batch_rows // 256) * 256  # Pallas sublane tiling
    est_windows = max(est_bases - int(est_bases / max(mean_len, k)) * (k - 1), 1)

    if sample and est_bases > (1 << 22):
        # the marginal new-kmer rate only drops once the sample spans a few
        # coverage multiples of the underlying genome — sample ~1/8th of
        # the input (capped) rather than a fixed prefix
        sample_bases = int(min(max(est_bases // 8, 2 << 20), 32 << 20))
        est_distinct = sample_distinct_estimate(
            bank, k, est_windows, sample_bases=sample_bases
        )
    else:
        est_distinct = est_windows  # upper bound, no sampling needed/worth it

    slot_bytes = (W + 1) * 4 * SORT_SCRATCH_FACTOR
    budget_slots = max(
        (max_memory_mb << 20) // slot_bytes // max(n_chips, 1), 1 << 16
    )
    # cap the per-chip table: beyond this, extra passes beat giant sorts
    # (compile time and flush latency both scale with the table; the
    # 2-bit batch cache makes re-reads cheap — reference n_iters design)
    budget_slots = min(budget_slots, MAX_TABLE_SLOTS)
    per_chip_distinct = -(-est_distinct // max(n_chips, 1))
    n_passes = max(
        1, -(-per_chip_distinct // int(budget_slots * TABLE_FILL_TARGET))
    )
    per_pass = -(-per_chip_distinct // n_passes)
    table_cap = _round_capacity(int(per_pass / TABLE_FILL_TARGET) + 1)
    table_cap = min(table_cap, budget_slots * 2)
    flush_items = min(max(table_cap, 1 << 20), 1 << 23)
    # mesh-engine flush cadence: buffer ~2x the table, so each flush's
    # (buf + table) sort is amortized over mostly-new volume (sort cost
    # per record = (buf+tab)/buf ~ 1.5x)
    windows_per_batch = max(batch_rows * (row_len - k + 1), 1)
    buf_batches = int(np.clip(2 * table_cap // windows_per_batch, 8, 256))
    return ResourcePlan(
        n_passes=n_passes,
        table_cap=table_cap,
        flush_items=flush_items,
        buf_batches=buf_batches,
        batch_rows=batch_rows,
        row_len=row_len,
        est_bases=est_bases,
        est_distinct=est_distinct,
        est_distinct_per_pass=per_pass,
    )
