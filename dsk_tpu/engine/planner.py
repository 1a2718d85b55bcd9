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

from dataclasses import dataclass

import numpy as np

from dsk_tpu.io.bank import Bank, open_bank
from dsk_tpu.kmer import codec

# Bytes of device memory consumed per table slot during a merge flush:
# (W words + count) * 4 bytes, times a scratch factor for lax.sort's
# operand copies (keys + payload, double-buffered).
SORT_SCRATCH_FACTOR = 6
TABLE_FILL_TARGET = 0.8  # plan tables at 80% occupancy (hash-split jitter)


@dataclass
class ResourcePlan:
    n_passes: int
    table_cap: int       # per chip, per pass (slots)
    flush_items: int     # pending windows before a merge flush
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
            "est_bases": self.est_bases,
            "est_distinct_kmers": self.est_distinct,
        }


def sample_distinct_ratio(
    bank: Bank, k: int, sample_bases: int = 2 << 20
) -> tuple[int, float]:
    """Count a bank prefix sample; return (sampled_bases, distinct/window).

    Lazy import of the engine avoids a module cycle (planner is imported
    by run.py which imports counter).
    """
    import jax

    from dsk_tpu.engine.counter import CountEngine
    from dsk_tpu.io.batch import batch_iterator

    rows, row_len = 256, 256

    def limited():
        seen = 0
        for batch in batch_iterator(bank, k, rows, row_len):
            yield batch
            seen += batch.n_bases
            if seen >= sample_bases:
                return

    eng = CountEngine(k, batch_rows=rows, row_len=row_len)
    # the sample is tiny: run it on the host CPU backend so planning never
    # pays TPU (remote) compiles before the real engine is even built
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            res = eng.count_stream(limited())
    else:  # pragma: no cover
        res = eng.count_stream(limited())
    windows = max(int(res.counts.sum()), 1)
    return res.info.get("n_bases", windows), res.n_distinct / windows


def plan_resources(
    bank: Bank | str,
    k: int,
    max_memory_mb: int = 5000,
    n_chips: int = 1,
    batch_rows: int = 1024,
    row_len: int = 256,
    sample: bool = True,
) -> ResourcePlan:
    if isinstance(bank, str):
        bank = open_bank(bank)
    W = codec.words_per_kmer(k)
    est_bases, mean_len = bank.estimate()
    est_windows = max(est_bases - int(est_bases / max(mean_len, k)) * (k - 1), 1)

    if sample and est_bases > (1 << 22):
        _, ratio = sample_distinct_ratio(bank, k)
        est_distinct = min(int(est_windows * ratio * 1.25), est_windows)
    else:
        est_distinct = est_windows  # upper bound, no sampling needed/worth it

    slot_bytes = (W + 1) * 4 * SORT_SCRATCH_FACTOR
    budget_slots = max(
        (max_memory_mb << 20) // slot_bytes // max(n_chips, 1), 1 << 16
    )
    per_chip_distinct = -(-est_distinct // max(n_chips, 1))
    n_passes = max(
        1, -(-per_chip_distinct // int(budget_slots * TABLE_FILL_TARGET))
    )
    per_pass = -(-per_chip_distinct // n_passes)
    table_cap = 1 << max(16, int(np.ceil(np.log2(per_pass / TABLE_FILL_TARGET + 1))))
    table_cap = min(table_cap, budget_slots * 2)
    flush_items = min(max(table_cap, 1 << 20), 1 << 23)
    return ResourcePlan(
        n_passes=n_passes,
        table_cap=table_cap,
        flush_items=flush_items,
        batch_rows=batch_rows,
        row_len=row_len,
        est_bases=est_bases,
        est_distinct=est_distinct,
        est_distinct_per_pass=per_pass,
    )
