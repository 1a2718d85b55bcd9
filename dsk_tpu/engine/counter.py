"""Single-chip counting engine: batches in, (kmer, abundance) table out.

The TPU re-design of the reference's SortingCountAlgorithm (SURVEY.md C1):
the disk partition files become a device-resident accumulation buffer; the
per-partition radix sort + run-length count becomes sort + segment-reduce
(dsk_tpu.kmer.device.sum_by_key); the count-processor chain (histogram,
solidity filter, dump) runs over the final device table
(dsk_tpu.engine.processors).

Multi-bank mode (needed by -solidity-kind and -histo2D, SURVEY.md C7)
appends the sub-bank id as an extra least-significant sort key word, so
the running table lives in (kmer, bank) space and is grouped into per-bank
abundance vectors at finalization.

Orchestration is host-driven (like the reference's pass loop) but all
per-base / per-kmer work happens on device under jit with static shapes.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dsk_tpu.engine import processors
from dsk_tpu.io.bank import Bank, open_bank
from dsk_tpu.io.batch import batch_iterator
from dsk_tpu.kmer import codec
from dsk_tpu.kmer.device import (
    SENTINEL,
    extract_canonical,
    pass_hash,
    sum_by_key,
)


def _round_up_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@jax.jit
def _merge_flush(words: jax.Array, weights: jax.Array):
    return sum_by_key(words, weights)


@functools.partial(jax.jit, static_argnames=("k", "n_passes", "per_bank"))
def prepare_batch(codes, bank_ids, pass_id, k, n_passes, per_bank):
    """Fused per-batch device work: extract canonical windows, apply the
    multi-pass hash filter (the reference's per-pass kmer selection,
    doc/paper.tex:74: keep kmers with h(x) mod n_iters == pass), and attach
    the bank-id key column for per-bank mode.

    Filtered-out rows become full sentinel rows (words AND weight) so they
    can never occupy distinct-table capacity.
    """
    words, valid = extract_canonical(codes, k)
    B, nw, W = words.shape
    flat = words.reshape(B * nw, W)
    weights = valid.reshape(B * nw).astype(jnp.int32)
    if n_passes > 1:
        sel = (pass_hash(flat) % jnp.uint32(n_passes)) == pass_id.astype(jnp.uint32)
        keep = sel & (weights > 0)
        flat = jnp.where(keep[:, None], flat, SENTINEL)
        weights = jnp.where(keep, weights, 0)
    if per_bank:
        bank_col = jnp.repeat(bank_ids.astype(jnp.uint32), nw)[:, None]
        bank_col = jnp.where(weights[:, None] > 0, bank_col, SENTINEL)
        flat = jnp.concatenate([flat, bank_col], axis=1)
    return flat, weights


@dataclass
class CountResult:
    """Final count table + histogram (host numpy)."""

    k: int
    kmers: np.ndarray      # (n, W) uint32, sorted ascending (A<C<T<G order)
    counts: np.ndarray     # (n,) int32 total abundances (all distinct kmers)
    histogram: np.ndarray  # (nb_bins+1,) int64, index = abundance (clipped)
    bank_counts: np.ndarray | None = None  # (n, nb_banks) per-bank abundance
    info: dict = field(default_factory=dict)

    @property
    def n_distinct(self) -> int:
        return int(self.kmers.shape[0])

    def solid(
        self,
        abundance_min: int = 2,
        abundance_max: int = 2**31 - 1,
        kind: str = "sum",
        custom=None,
    ):
        """(kmers, counts) filtered by the solidity rule (reference
        README.md:12; kinds per SURVEY.md C7)."""
        m = processors.solidity_mask(
            self.counts, kind, abundance_min, abundance_max,
            bank_counts=self.bank_counts, custom=custom,
        )
        return self.kmers[m], self.counts[m]

    def items(self):
        """Iterate (python-int packed kmer value, abundance)."""
        for row, a in zip(self.kmers, self.counts):
            yield codec.words_to_value(row), int(a)

    def dump_text(self, abundance_min: int = 2, abundance_max: int = 2**31 - 1):
        """Sorted '<KMER> <count>' lines (dsk2ascii-equivalent form)."""
        km, ct = self.solid(abundance_min, abundance_max)
        return [
            f"{codec.kmer_to_string(codec.words_to_value(row), self.k)} {int(a)}"
            for row, a in zip(km, ct)
        ]


class CountEngine:
    """Canonical k-mer counter over one device (multi-chip in dsk_tpu.dist).

    flush_items bounds the device sort size (the analog of the reference's
    per-partition memory bound, doc/paper.tex:66-67): raw windows accumulate
    until the buffer would exceed it, then are sorted/merged into the
    running distinct-kmer table.
    """

    def __init__(
        self,
        k: int,
        batch_rows: int = 1024,
        row_len: int = 256,
        flush_items: int = 1 << 22,
        nb_bins: int = 10000,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.W = codec.words_per_kmer(k)
        self.batch_rows = batch_rows
        self.row_len = max(row_len, k)
        self.flush_items = flush_items
        self.nb_bins = nb_bins

    def count(
        self,
        bank: Bank | str,
        per_bank: bool = False,
        n_passes: int = 1,
        cache_dir: str | None = None,
        done_passes: dict[int, CountResult] | None = None,
        on_pass=None,
        n_workers: int = 1,
        max_disk_mb: int = 0,
    ) -> CountResult:
        """Full count.  Multi-pass restartability (SURVEY.md section 5.3-4):
        done_passes supplies already-completed pass results (from a
        checkpoint), on_pass(p, result) is called after each fresh pass
        (the checkpoint write hook)."""
        if isinstance(bank, str):
            bank = open_bank(bank)
        if n_passes <= 1:
            from dsk_tpu.io.prefetch import prefetch

            res = self.count_stream(
                prefetch(
                    batch_iterator(
                        bank, self.k, self.batch_rows, self.row_len,
                        n_workers=n_workers,
                    )
                ),
                nb_banks=bank.nb_banks,
                per_bank=per_bank,
            )
            if on_pass is not None:
                on_pass(0, res)
            return res
        # multi-pass: re-read the input once per pass, each pass restricted
        # to its hash class of kmer space (reference n_iters semantics,
        # doc/paper.tex:66-76) — pass tables are disjoint, so the merge is
        # a concatenation + host sort.  Pass 0 tees the encoded batches
        # into a 2-bit cache (BankBinary analog, C11) so later passes skip
        # gunzip/parse/encode.
        done_passes = done_passes or {}
        results = []
        for p, batches in multipass_batches(
            bank, self.k, self.batch_rows, self.row_len, n_passes, cache_dir,
            n_workers=n_workers, max_disk_mb=max_disk_mb,
        ):
            if p in done_passes:
                # drain pass-0's tee so the cache still gets written
                if p == 0 and len(done_passes) < n_passes:
                    for _ in batches:
                        pass
                results.append(done_passes[p])
                continue
            res = self.count_stream(
                batches,
                nb_banks=bank.nb_banks,
                per_bank=per_bank,
                pass_id=p,
                n_passes=n_passes,
            )
            if on_pass is not None:
                on_pass(p, res)
            results.append(res)
        return merge_pass_results(results)

    def count_stream(
        self,
        batches,
        nb_banks: int = 1,
        per_bank: bool = False,
        pass_id: int = 0,
        n_passes: int = 1,
    ) -> CountResult:
        """Count over an iterable of Batch objects (the core loop; count()
        wraps it with the bank reader, bench feeds it synthetic batches)."""
        k, W = self.k, self.W
        # per-bank mode: bank id rides as an extra least-significant key word
        per_bank = per_bank and nb_banks > 1
        WK = W + 1 if per_bank else W

        table_words: jax.Array | None = None  # (C, WK) uint32 sentinel-padded
        table_counts: jax.Array | None = None
        pending: list[tuple[jax.Array, jax.Array]] = []
        pending_items = 0
        n_bases = 0
        n_reads = 0

        def flush():
            nonlocal table_words, table_counts, pending, pending_items
            if not pending and table_words is None:
                return
            parts_w = [w for w, _ in pending]
            parts_c = [c for _, c in pending]
            if table_words is not None:
                parts_w.append(table_words)
                parts_c.append(table_counts)
            total = sum(p.shape[0] for p in parts_w)
            cap = _round_up_pow2(total)
            words = jnp.concatenate(
                parts_w + [jnp.full((cap - total, WK), SENTINEL)], axis=0
            )
            weights = jnp.concatenate(
                parts_c + [jnp.zeros(cap - total, jnp.int32)], axis=0
            )
            uniq, counts, n_uniq = _merge_flush(words, weights)
            n = int(n_uniq)
            c = _round_up_pow2(max(n, 1))
            table_words = uniq[:c]
            table_counts = counts[:c]
            pending = []
            pending_items = 0

        # host-side occurrence-volume guard: the flush cumsum
        # (kmer/device._run_heads) totals all occurrences seen this pass
        # (table counts + pending weights) in int32.  Valid windows are
        # bounded by bases, and the pass filter keeps ~1/n_passes of
        # them; 1.6e9 leaves hash-jitter margin under 2^31.  The dist
        # engine has an exact device-side guard (CountVolumeOverflow);
        # this engine is the small/per-bank path, a conservative host
        # bound suffices.
        occ_limit = 1_600_000_000 * max(n_passes, 1)

        for batch in batches:
            flat, weights = prepare_batch(
                jnp.asarray(batch.codes),
                jnp.asarray(batch.bank_ids),
                jnp.int32(pass_id),
                k,
                n_passes,
                per_bank,
            )
            pending.append((flat, weights))
            pending_items += flat.shape[0]
            n_bases += int(batch.n_bases)
            n_reads += int(batch.n_reads)
            if n_bases > occ_limit:
                from dsk_tpu.dist.engine import CountVolumeOverflow

                raise CountVolumeOverflow(
                    f"occurrence-volume overflow: {n_bases} bases "
                    f"streamed in one pass would overflow the int32 "
                    f"flush accumulator; more passes needed"
                )
            if pending_items >= self.flush_items:
                flush()
        flush()

        info = {"n_bases": n_bases, "n_reads": n_reads, "nb_banks": nb_banks}
        if table_words is None:
            return CountResult(
                k=k,
                kmers=np.empty((0, W), np.uint32),
                counts=np.empty((0,), np.int32),
                histogram=np.zeros(self.nb_bins + 1, np.int64),
                bank_counts=np.zeros((0, nb_banks), np.int64) if per_bank else None,
                info=info,
            )

        n = int(jnp.sum(table_counts > 0))
        rows = np.asarray(table_words[:n])
        row_counts = np.asarray(table_counts[:n])

        if per_bank:
            kmers, counts, bank_mat = _group_by_kmer(
                rows, row_counts, W, nb_banks
            )
        else:
            kmers, counts, bank_mat = rows, row_counts, None

        hist = processors.histogram(counts, self.nb_bins)
        return CountResult(
            k=k,
            kmers=kmers,
            counts=counts.astype(np.int32),
            histogram=hist,
            bank_counts=bank_mat,
            info=info,
        )


def multipass_batches(
    bank: Bank,
    k: int,
    batch_rows: int,
    row_len: int,
    n_passes: int,
    cache_dir: str | None = None,
    n_workers: int = 1,
    max_disk_mb: int = 0,
):
    """Yield (pass_id, batch_iterable) per pass; pass 0 reads the bank and
    tees a 2-bit batch cache, later passes stream the cache (C11 analog).
    The cache is removed when the generator is exhausted or closed.

    max_disk_mb bounds the cache (the reference's -max-disk budget,
    README.md:130); 0 = auto (free space on the cache filesystem minus a
    safety margin).  If the budget (or the disk) is exhausted mid-tee the
    cache is dropped and later passes re-read the bank — bounded disk use
    at the cost of re-parsing, never a crashed run."""
    import tempfile
    import uuid

    from dsk_tpu.io import cache as bcache

    from dsk_tpu.io.prefetch import prefetch

    d = cache_dir or tempfile.gettempdir()
    path = os.path.join(d, f"dsk_tpu_cache_{uuid.uuid4().hex}.bin")
    if max_disk_mb and max_disk_mb > 0:
        max_bytes = max_disk_mb << 20
    else:
        try:
            import shutil

            free = shutil.disk_usage(d).free
            max_bytes = max(free - (1 << 30), 1 << 20)  # keep 1 GB headroom
        except OSError:
            max_bytes = None
    try:
        writer = bcache.BatchCacheWriter(
            path, k, batch_rows, row_len, max_bytes=max_bytes
        )
        yield 0, bcache.teeing_iterator(
            prefetch(
                batch_iterator(bank, k, batch_rows, row_len, n_workers=n_workers)
            ),
            writer,
        )
        for p in range(1, n_passes):
            if getattr(writer, "aborted", False):
                yield p, prefetch(
                    batch_iterator(
                        bank, k, batch_rows, row_len, n_workers=n_workers
                    )
                )
            else:
                yield p, prefetch(bcache.read_batches(path))
    finally:
        if os.path.exists(path):
            os.unlink(path)


def merge_pass_results(results: list[CountResult]) -> CountResult:
    """Merge per-pass tables (disjoint kmer sets) into one sorted result."""
    first = results[0]
    kmers = np.concatenate([r.kmers for r in results], axis=0)
    counts = np.concatenate([r.counts for r in results], axis=0)
    bank_counts = None
    if first.bank_counts is not None:
        bank_counts = np.concatenate([r.bank_counts for r in results], axis=0)
    # restore global ascending order (lexicographic over big-endian words ==
    # integer order); np.lexsort keys are last-significant-first
    order = np.lexsort(tuple(kmers[:, w] for w in range(kmers.shape[1] - 1, -1, -1)))
    kmers = kmers[order]
    counts = counts[order]
    if bank_counts is not None:
        bank_counts = bank_counts[order]
    hist = np.sum([r.histogram for r in results], axis=0)
    info = dict(first.info)
    # the merge re-sorts globally, so per-pass partition boundaries are gone
    info.pop("partition_sizes", None)
    info["n_bases"] = first.info.get("n_bases", 0)
    info["n_passes"] = len(results)
    # resume evidence is per pass: a crash in pass p>=1 resumes with
    # pass 0's info flags False — OR them so callers (and the hardware
    # resume gate) see that ANY pass actually resumed
    for key in ("spill_resumed", "fill_resumed"):
        if any(r.info.get(key) for r in results):
            info[key] = True
    return CountResult(
        k=first.k,
        kmers=kmers,
        counts=counts,
        histogram=hist,
        bank_counts=bank_counts,
        info=info,
    )


def _group_by_kmer(
    rows: np.ndarray, row_counts: np.ndarray, W: int, nb_banks: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse a sorted (kmer_words..., bank_id) table into distinct kmers
    with total + per-bank abundance (host-side finalization of per-bank mode)."""
    if rows.shape[0] == 0:
        return (
            np.empty((0, W), np.uint32),
            np.empty((0,), np.int64),
            np.zeros((0, nb_banks), np.int64),
        )
    keys = rows[:, :W]
    banks = rows[:, W].astype(np.int64)
    is_new = np.ones(rows.shape[0], dtype=bool)
    is_new[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    seg = np.cumsum(is_new) - 1
    n_kmers = int(seg[-1]) + 1
    kmers = keys[is_new]
    bank_mat = np.zeros((n_kmers, nb_banks), dtype=np.int64)
    np.add.at(bank_mat, (seg, banks), row_counts.astype(np.int64))
    counts = bank_mat.sum(axis=1)
    return kmers, counts, bank_mat
