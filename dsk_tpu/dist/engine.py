"""Multi-chip counting engine: shard_map + all_to_all k-mer routing.

The TPU re-design of the reference's partitioned counting (SURVEY.md P2-P4,
section 2.4).  In DSK, k-mers are routed by hash/minimizer to partition
FILES on disk, then each partition is sorted/counted independently
(doc/paper.tex:71-91).  Here:

  * reads are data-parallel over the chip mesh axis (each chip extracts
    canonical k-mers from its shard of the batch — the thread-pool fill
    phase, P3),
  * each k-mer is routed to its OWNER chip by a mixed hash of its words
    via `lax.all_to_all` over ICI (the partition files, P2); duplicates
    are collapsed locally BEFORE routing (superkmer-compression analog),
  * each chip appends received k-mers into a device-resident accumulation
    buffer (HBM replaces disk) and periodically merges the buffer into its
    running distinct-kmer table with sort + segment-reduce (the
    per-partition counting, P4),
  * the abundance histogram is merged with `psum` (the stats merge).

Data layout is WORD PLANES: kmers live as W separate uint32 arrays (word 0
most significant), so every lax.sort operand is contiguous — no strided
(N, W) slicing on the hot path.  Extraction uses the Pallas kernel on TPU
(dsk_tpu.kmer.pallas_kernels), the jnp sweep elsewhere.

On a single chip the routing collapses to extract + bucketize (no
all_to_all).  Appended rows are partitioned into S hash buckets so the
flush is a BATCHED sort over VMEM-sized bucket rows (~2.6x faster per
row than one flat lax.sort, measured v5e) — the per-partition sort of
the reference, re-expressed for the sort-centric TPU.

Everything is static-shaped: the per-destination send capacity is fixed
(mean + slack), overflow is *counted* on device and checked on host at
the end (raise; the multi-pass retry valve mirrors the reference's
n_iters semantics, doc/paper.tex:66).  The flush schedule is static
(every `buf_batches` batches), so a whole pass compiles to a handful of
XLA executables with no host round-trips in the loop.

Output tables are partitioned by owner chip — partition p of the output
store is chip p's table in (hash-bucket, kmer) order (the analog of
dsk/solid/<i>; dump order is partition order like the reference, and
`dsk2ascii -sorted` gives the normative A<C<T<G-sorted dump).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dsk_tpu.engine.counter import CountResult, merge_pass_results
from dsk_tpu.io.bank import Bank, open_bank
from dsk_tpu.io.batch import batch_iterator
from dsk_tpu.kmer import codec
from dsk_tpu.kmer.device import (
    SENTINEL,
    kmer_hash,  # noqa: F401  (re-exported: partition semantics helper)
    kmer_hash_planes,
    pass_hash_planes,
    sum_by_key_planes,
    sum_by_key_planes_2d,
)
from dsk_tpu.kmer.pallas_kernels import (
    extract_canonical_planes_jnp,
    extract_canonical_planes_tpu,
)

AXIS = "chips"

# The per-chip table-overflow counter is bit-packed: low 16 bits count
# table/compaction overflows (at most 1 per flush — far below 2^16 for
# any realistic run), high bits count occurrence-cumsum wraps
# (CountVolumeOverflow).  One int32 per chip keeps the step program
# signature (and its persistent-cache key) unchanged.
WRAP_SHIFT = 16


class RoutingOverflow(RuntimeError):
    """Some kmers exceeded the per-destination all_to_all bucket capacity.
    Retry valve: higher send_slack (the reference balances partitions via
    frequency-aware repartition, SURVEY.md C6; slack is our headroom)."""


class TableOverflow(RuntimeError):
    """A chip's distinct-kmer table exceeded table_cap.  Retry valve: more
    passes (the reference's n_iters semantics, doc/paper.tex:66)."""


class CountVolumeOverflow(TableOverflow):
    """A chip's per-pass OCCURRENCE volume wrapped the int32 flush cumsum
    (> 2^31 k-mer occurrences on one chip in one pass — the quantity the
    reference plans n_iters from, doc/paper.tex:66-67).  Counts from the
    wrapping flush are garbage; the stream must be aborted.  Retry
    valve: more passes (per-pass volume ~ 1/n_passes) — a subclass of
    TableOverflow so the same handler catches it, but the retry keeps
    the two-stage compaction (segment slack loss is not the cause)."""


class _PerBankSink:
    """Adapter occupying count()'s pass-sink slot for PER-BANK streaming
    output (VERDICT r3 weak #5): fn(pass_id, partition_id, kmers,
    total_counts, bank_matrix) receives each chip's table GROUPED per
    kmer, one chip at a time — peak host memory is one chip's live
    (kmer, bank) rows, independent of total distinct count.  Grouping
    per chip is complete because the owner hash uses the W kmer words
    only (never the bank plane), so every bank's copies of a kmer live
    on one chip.  Also carries the per-pass histogram built during the
    gather (slim per-bank results cannot use the device histogram — it
    counts (kmer, bank) pairs, not kmers)."""

    def __init__(self, fn):
        self.fn = fn
        self.nb_banks = 1
        self.hist = None


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


@dataclass
class _Plan:
    """Static shapes of one distributed pass."""

    n: int                # chips
    rows_per_chip: int
    nw: int               # windows per row
    m: int                # windows per chip per batch
    send_cap: int         # per-destination bucket capacity C (n > 1)
    recv_per_batch: int   # appended rows per batch: n*C (n>1) or m (n==1)
    buf_batches: int
    buf_cap: int          # total buffer slots per chip: S * G * bucket_cols
    table_cap: int        # per chip (multiple of S)
    S: int = 1            # key-space buckets per chip (batched flush sorts)
    bucket_cols: int = 0  # buffer columns per (bucket, batch slot)
    flush_cols: int = 0   # per-bucket width of the flush-time partition
                          # (bucketize_at="flush": flat buffer, one 1-key
                          # sort per GROUP instead of per batch)


class DistCountEngine:
    """Canonical k-mer counter over a chip mesh.

    send_slack: per-destination capacity = slack * mean routed volume; the
    frequency skew headroom (the reference balances partitions with
    frequency-aware minimizer repartition, SURVEY.md C6 — hash routing
    plus local dedup plus slack plays that role here).
    """

    def __init__(
        self,
        k: int,
        mesh: Mesh | None = None,
        batch_rows: int = 1024,
        row_len: int = 256,
        send_slack: float = 2.5,
        buf_batches: int = 8,
        table_cap: int = 1 << 20,
        nb_bins: int = 10000,
        n_passes: int = 1,
        per_bank: bool = False,
        routing: str = "hash",
        minimizer_size: int = 10,
        max_span: int = 32,
        repartition: np.ndarray | None = None,
        flush_buckets: int = 1,
        bucketize_at: str = "flush",
        flush_mode: str = "sort",
        compact_segments: int | None = None,
        wire: str | None = None,
        spill_partitions: int = 0,
        spill_dir: str | None = None,
        spill_chunk_rows: int = 0,
    ):
        """routing: "hash" (per-kmer hash owners, local dedup before the
        all_to_all) or "superkmer" (KMC3-style: consecutive windows
        sharing a minimizer travel as ONE packed-bases record, cutting
        ICI bytes ~(k-m)/2-fold; owner = hash(minimizer) % n or the
        frequency-balanced repartition table — reference CHANGELOG.md:13,
        SURVEY.md C6).  Single-chip meshes ignore routing (raw append).

        bucketize_at (only used when flush_buckets > 1): "flush" keeps
        the append buffer FLAT and partitions it into the S key-space
        buckets ONCE per flush group (one 1-key sort of the whole
        buffer), so the per-batch bucketize tax that made the round-2
        "route"-time variant a net loss is paid G times less often;
        "route" is that original variant (bucketize every batch during
        append)."""
        self.k = k
        self.n_passes = n_passes
        self.per_bank = per_bank
        # host-side partition spill (VERDICT r3 missing #2; the disk
        # half of DSK's fill/count split, doc/paper.tex:71-91): > 0
        # switches the engine to spill mode with that many hash
        # partitions — see dist/spill.py for the design.
        self.spill = spill_partitions > 0
        self.spill_partitions = spill_partitions
        self.spill_dir = spill_dir
        # per-bank spill (VERDICT r4 missing #3): the bank id already
        # travels as the extra least-significant key word (WK = W+1), so
        # spill records are simply (WK+1)-word rows; the partition hash
        # keeps using the W kmer words only (spill_group_shard hashes
        # uniq[:W]; SpillStore splits with hash_words=W), so every
        # bank's copies of a kmer land in ONE partition and the count
        # phase can group them per kmer — DSK's fixed-memory contract
        # now covers histo2D / non-sum solidity too
        # (/root/reference/README.md:96-99, doc/paper.tex:71-91).
        # H2D wire format: "exc" (2-bit code words + per-row sparse
        # exception meta, ~2.3 bits/base — io/packed.py pack_codes_exc)
        # or "bitmap" (dense 1-bit/base validity map, 3.03 bits/base).
        # The wire is the CLI bottleneck on the tunnel (and the NIC on
        # real hosts); exc is the default, and a WireOverflow on
        # N-dense input falls back to bitmap via the retry valve
        # (engine/run.py).  Resolved below once multi_process is known:
        # a WireOverflow is HOST-LOCAL, and one process aborting a
        # lockstep stream would desync the others' collectives, so
        # multi-process meshes default to the any-row bitmap format.
        import os as _os

        wire_req = wire or _os.environ.get("DSK_TPU_WIRE")
        if wire_req not in (None, "exc", "bitmap"):
            raise ValueError(f"unknown wire format {wire_req!r}")
        from dsk_tpu.io.packed import EXC_E

        self.wire_E = EXC_E
        self.W = codec.words_per_kmer(k)
        # per-bank mode threads the sub-bank id through the pipeline as an
        # extra least-significant key word (SURVEY.md C7 multi-bank needs)
        self.WK = self.W + (1 if per_bank else 0)
        self.mesh = mesh or default_mesh()
        self.n = self.mesh.devices.size
        self.row_len = max(row_len, k)
        self.rows_per_chip = max(1, batch_rows // self.n)
        self.batch_rows = self.rows_per_chip * self.n
        if routing not in ("hash", "superkmer"):
            raise ValueError(f"unknown routing {routing!r}")
        # spill fill is collective-free (each chip spills its own shard;
        # the partition hash replaces owner-chip routing), so superkmer
        # routing has nothing to compress
        self.routing = (
            routing if (self.n > 1 and not self.spill) else "hash"
        )
        self.minimizer_size = minimizer_size
        self.max_span = max_span
        self.repartition = repartition
        nw = self.row_len - k + 1
        m = self.rows_per_chip * nw
        if self.n == 1 or self.spill:
            # spill: no all_to_all — every chip appends its OWN shard's
            # windows (partitioning happens at the host bucket level)
            send_cap = 0
            recv = m
        elif self.routing == "superkmer":
            # records, not kmers: mean span ~ (k - m_len + 2) / 2 windows
            # per record; slack covers skew + the split of long runs
            mean_span = max((k - minimizer_size + 2) / 2.0, 1.0)
            est_recs = m / mean_span
            send_cap = int(np.ceil(est_recs / self.n * max(send_slack, 3.0)))
            send_cap = min(max(send_cap, 64), m)
            # each received record expands to <= max_span windows
            recv = self.n * send_cap * max_span
        else:
            send_cap = int(np.ceil(m / self.n * send_slack))
            send_cap = min(max(send_cap, 64), m)
            recv = self.n * send_cap
        # key-space buckets (flush_buckets > 1): the flush then sorts
        # (S, R) batched rows that fit VMEM instead of one flat lax.sort
        # — DSK's per-partition sort analog (batched sorts measured 2.6x
        # cheaper per row on v5e).  Two variants:
        #   bucketize_at="route": partition every batch during append.
        #     MEASURED round 2: the per-batch tax (a 1-key sort of the
        #     whole batch + S*(WK+1) slice ops) outweighs the batched-
        #     sort gain at the default buffer/table ratio (48.7 vs 64.2
        #     Mbases/s).
        #   bucketize_at="flush" (default): keep the buffer flat and
        #     partition ONCE per flush group — the tax is paid G times
        #     less often and the persistent table never re-sorts
        #     globally.
        if bucketize_at not in ("route", "flush"):
            raise ValueError(f"unknown bucketize_at {bucketize_at!r}")
        if flush_mode not in ("sort", "merge"):
            raise ValueError(f"unknown flush_mode {flush_mode!r}")
        # "merge": the flush sorts ONLY the group buffer, then folds the
        # persistent table in with a bitonic merge network (the table is
        # already sorted — kmer/device.py sum_by_key_presorted).  Flat
        # (S == 1) flushes only.
        self.flush_mode = flush_mode if flush_buckets <= 1 else "sort"
        S = 1
        if self.spill:
            flush_buckets = 1  # spill group dedup is always flat
        if flush_buckets > 1 and table_cap >= 2048:
            S = min(flush_buckets, table_cap // 256)
            S = 1 << (S.bit_length() - 1)
        self.bucketize_at = bucketize_at if S > 1 else "route"
        self.flat_buffer = S == 1 or bucketize_at == "flush"
        table_cap = -(-table_cap // S) * S
        # bucket headroom scales with send_slack so the overflow retry
        # valve (run.py doubles send_slack) also widens buckets
        self.bucket_slack = 1.35 * max(send_slack / 2.5, 1.0)
        if self.flat_buffer:
            bucket_cols = recv
        else:
            bucket_cols = int(np.ceil(recv * self.bucket_slack / S))
        # flush-time partition width per bucket (whole group, skew-averaged
        # over G batches; rounded to the 128-lane tile)
        flush_cols = 0
        if S > 1 and self.flat_buffer:
            flush_cols = int(
                np.ceil(buf_batches * recv * self.bucket_slack / S)
            )
            flush_cols = -(-flush_cols // 128) * 128
        self.plan = _Plan(
            n=self.n,
            rows_per_chip=self.rows_per_chip,
            nw=nw,
            m=m,
            send_cap=send_cap,
            recv_per_batch=recv,
            buf_batches=buf_batches,
            buf_cap=(1 if self.flat_buffer else S) * buf_batches
            * bucket_cols,
            table_cap=table_cap,
            S=S,
            bucket_cols=bucket_cols,
            flush_cols=flush_cols,
        )
        # two-stage flush compaction segments (flat "sort" flushes only):
        # batched per-segment 1-key sorts front-load run heads, a small
        # flat sort restores global order — 28% cheaper than the
        # monolithic compaction at G8 bench shapes (PERF.md, kmer/device
        # sum_by_key_planes_capped).  Auto: segments of >= 128K rows.
        # Segment-slack head loss is counted into the table-overflow
        # valve; the run.py retry falls back to monolithic (segments=0).
        if compact_segments is None and S == 1 and self.flush_mode == "sort":
            n_flush = self.plan.buf_cap + table_cap
            cs = 1
            while n_flush // (cs * 2) >= (1 << 17):
                cs *= 2
            self.compact_segments = cs
        else:
            self.compact_segments = max(int(compact_segments or 0), 1)
        self.nb_bins = nb_bins
        # multi-process mesh: this host feeds rows only for its own chips
        # (jax.make_array_from_process_local_data assembles the global
        # batch; SURVEY.md §2.4)
        self.n_local_chips = sum(
            1
            for d in self.mesh.devices.flat
            if d.process_index == jax.process_index()
        )
        self.multi_process = self.n_local_chips < self.n
        self.local_batch_rows = self.rows_per_chip * self.n_local_chips
        # multi-process spill: spill_dir MUST be a SHARED filesystem —
        # each host appends host-suffixed bucket files and the count
        # phase reads every host's files for the partitions it owns
        # (the reference's filesystem-as-interconnect,
        # doc/paper.tex:71-76, stretched across hosts).  The count
        # phase is host-LOCAL (no collectives): partitions are owned by
        # pid % n_hosts and merged on the owner's first local chip.
        # count-phase merge chunk (records per chip per H2D transfer):
        # big enough to amortize the merge sort over the table, bounded
        # so the H2D payload and sort scratch stay modest
        self.spill_chunk_rows = int(
            spill_chunk_rows
            or min(max(2 * self.plan.table_cap, 1 << 16), 1 << 23)
        )
        if wire_req == "exc" and self.multi_process:
            # a WireOverflow is HOST-LOCAL: one process aborting a
            # lockstep stream leaves the others blocked in collectives
            # (distributed hang, not a retry).  Reject loudly at
            # construction instead of honoring a stale DSK_TPU_WIRE=exc.
            raise ValueError(
                "wire='exc' is not supported on multi-process meshes "
                "(a host-local WireOverflow would desync the lockstep "
                "collectives); use the default bitmap format"
            )
        if wire_req == "exc" and self.row_len >= 0xFFFF:
            # uint16 positions cannot address such rows; fail at
            # construction, not from a pack thread mid-stream
            raise ValueError(
                f"wire='exc' needs row_len < 65535, got {self.row_len}"
            )
        self.wire = wire_req or (
            "bitmap"
            if self.multi_process or self.row_len >= 0xFFFF
            else "exc"
        )
        if self.spill:
            # spill mode sustains BIDIRECTIONAL tunnel traffic (H2D
            # input wire + D2H drains); unsynchronized concurrent
            # directions wedged the axon device server at the 4-Gbase
            # tier (both the run AND fresh probe processes hung until
            # the run was killed).  One lock serializes wire OPERATIONS
            # (each still internally multiplexed over parallel
            # streams).  Real PCIe needs none of this — the lock exists
            # only because self.spill engines drain continuously.
            import threading

            self._wire_lock = threading.Lock()
        from dsk_tpu.kmer.pallas_kernels import MIN_PALLAS_ROW_LEN

        self.use_pallas = (
            self.mesh.devices.flat[0].platform == "tpu"
            and self.row_len >= MIN_PALLAS_ROW_LEN
            and (self.rows_per_chip % 8 == 0 or self.rows_per_chip < 8)
        )
        self._build()

    # -- jitted programs -------------------------------------------------

    def _build(self):
        k, W, plan, mesh = self.k, self.W, self.plan, self.mesh
        WK = self.WK
        per_bank = self.per_bank
        n = plan.n
        n_passes = self.n_passes
        use_pallas = self.use_pallas

        def extract_flat(batch, bids):
            """(rows, L) codes -> ((WK, m) planes, (m,) int32 weights).

            In per-bank mode the last plane is the row's sub-bank id
            (SENTINEL on dead rows so sentinels stay full-sentinel)."""
            if use_pallas:
                planes, valid = extract_canonical_planes_tpu(batch, k)
            else:
                planes, valid = extract_canonical_planes_jnp(batch, k)
            flat = planes.reshape(W, plan.m)
            weights = valid.reshape(plan.m).astype(jnp.int32)
            if per_bank:
                bank_row = jnp.repeat(bids.astype(jnp.uint32), plan.nw)
                bank_row = jnp.where(weights > 0, bank_row, SENTINEL)
                flat = jnp.concatenate([flat, bank_row[None, :]], axis=0)
            return flat, weights

        def maybe_pass_filter(flat, weights, pass_sel):
            if n_passes <= 1:
                return flat, weights
            # multi-pass selection (reference n_iters, doc/paper.tex:74);
            # rejected rows become full sentinels so they cannot occupy
            # table capacity
            # pass hash over the W kmer words ONLY (never the bank plane):
            # pass tables must stay disjoint in KMER space for the merge
            sel = (
                pass_hash_planes(tuple(flat[:W])) % jnp.uint32(n_passes)
            ) == pass_sel.astype(jnp.uint32)
            keep = sel & (weights > 0)
            flat = jnp.where(keep[None, :], flat, SENTINEL)
            return flat, jnp.where(keep, weights, 0)

        S = plan.S
        C = plan.bucket_cols
        logS = int(np.log2(S)) if S > 1 else 0
        flat_buffer = self.flat_buffer

        def partition_by_bucket(flat, weights, cols):
            """Partition (WK, X) rows into S hash buckets of width
            `cols`: (WK, S, cols) planes, (S, cols) weights, + overflow.

            One 1-key sort groups rows by bucket key (top logS hash
            bits; dead rows key S so they sort last and fall off); S
            unrolled dynamic slices move the segments (scatter is ~6x
            slower on TPU).  Rows beyond a bucket's `cols` are counted
            into the returned overflow (RoutingOverflow -> retry with
            more slack)."""
            X = flat.shape[1]
            h = kmer_hash_planes(tuple(flat[:W]))
            if logS > 0:
                bk = (h >> jnp.uint32(32 - logS)).astype(jnp.uint32)
            else:
                bk = jnp.zeros((X,), jnp.uint32)
            bkey = jnp.where(weights > 0, bk, jnp.uint32(S))
            s = jax.lax.sort(
                (bkey,) + tuple(flat) + (weights,), num_keys=1
            )
            sb, sp, sw = s[0], s[1 : 1 + WK], s[1 + WK]
            starts = jnp.searchsorted(
                sb, jnp.arange(S + 1, dtype=jnp.uint32)
            ).astype(jnp.int32)
            lens = starts[1:] - starts[:-1]
            n_over = jnp.sum(jnp.maximum(lens - cols, 0)).astype(jnp.int32)
            pads = jnp.full((cols,), SENTINEL)
            padw = jnp.zeros((cols,), jnp.int32)
            spp = [jnp.concatenate([sp[w], pads]) for w in range(WK)]
            swp = jnp.concatenate([sw, padw])
            jj = jnp.arange(cols, dtype=jnp.int32)
            rows_w = []
            rows_p = []
            for b in range(S):
                st = starts[b]
                mask = jj < lens[b]
                rows_w.append(
                    jnp.where(
                        mask, jax.lax.dynamic_slice(swp, (st,), (cols,)), 0
                    )
                )
                rows_p.append(
                    [
                        jnp.where(
                            mask,
                            jax.lax.dynamic_slice(spp[w], (st,), (cols,)),
                            SENTINEL,
                        )
                        for w in range(WK)
                    ]
                )
            block_c = jnp.stack(rows_w)                      # (S, cols)
            block_p = jnp.moveaxis(
                jnp.stack([jnp.stack(r) for r in rows_p]), 1, 0
            )                                                # (WK, S, cols)
            return block_p, block_c, n_over

        def bucketize_append(flat, weights, buf_p, buf_c, over, slot):
            """Append one batch's (WK, X) rows at batch slot `slot`.

            Flat buffer (S == 1, or bucketize_at="flush"): contiguous
            append, no per-batch work — the flush partitions the whole
            group at once.  Route-bucketized (bucketize_at="route"):
            partition the batch into the (WK, S, G*C) bucketized buffer
            here (the round-2 variant; per-batch tax measured a net loss
            at default shapes, kept for ratios where it wins)."""
            if flat_buffer:
                off = slot * C
                buf_p = jax.lax.dynamic_update_slice(
                    buf_p, flat[:, None, :], (0, 0, off)
                )
                buf_c = jax.lax.dynamic_update_slice(
                    buf_c, weights[None, :], (0, off)
                )
                return buf_p, buf_c, over
            block_p, block_c, n_over = partition_by_bucket(
                flat, weights, C
            )
            over = over + n_over[None]
            off = slot * C
            buf_p = jax.lax.dynamic_update_slice(
                buf_p, block_p, (0, 0, off)
            )
            buf_c = jax.lax.dynamic_update_slice(buf_c, block_c, (0, off))
            return buf_p, buf_c, over

        def fill_shard(batch, bids, buf_p, buf_c, over, slot, pass_sel):
            """Single-chip fast path: extract + bucketize (no routing)."""
            flat, weights = extract_flat(batch, bids)
            flat, weights = maybe_pass_filter(flat, weights, pass_sel)
            return bucketize_append(flat, weights, buf_p, buf_c, over, slot)

        def route_shard(batch, bids, buf_p, buf_c, over, slot, pass_sel):
            """Multi-chip: extract + local dedup + hash-route + append.

            batch: (rows_per_chip, L) uint8;  buf_p: (WK, buf_cap);
            buf_c: (buf_cap,); over: (1,) int32; slot/pass_sel replicated.
            """
            flat, weights = extract_flat(batch, bids)
            flat, weights = maybe_pass_filter(flat, weights, pass_sel)

            # local pre-aggregation: collapse duplicate kmers BEFORE routing
            # so a hot kmer travels as one (kmer, weight) record per batch
            planes, counts, _ = sum_by_key_planes(tuple(flat), weights)

            # owner by the W kmer words only: all banks' copies of a kmer
            # land on the same chip (required for per-kmer grouping)
            owner = (
                kmer_hash_planes(planes[:W]) % jnp.uint32(n)
            ).astype(jnp.int32)
            owner = jnp.where(counts > 0, owner, n)  # sentinels sort last

            # sort by owner, carrying (planes, counts)
            s = jax.lax.sort((owner,) + planes + (counts,), num_keys=1)
            sowner, skey, scounts = s[0], s[1 : 1 + WK], s[1 + WK]

            # position within owner group (owner-sorted -> group starts
            # are where owner changes; cummax gives each row its start)
            m = plan.m
            idx = jnp.arange(m, dtype=jnp.int32)
            is_new = jnp.ones((m,), jnp.bool_).at[1:].set(sowner[1:] != sowner[:-1])
            group_start = jax.lax.cummax(jnp.where(is_new, idx, 0), axis=0)
            pos = idx - group_start

            Cr = plan.send_cap
            # ONE scatter + ONE all_to_all for all WK key words + the
            # counts: the planes are stacked into a (n, Cr, WK+1) uint32
            # payload (counts bitcast), so each scan step launches a
            # single collective instead of WK+1 (VERDICT r2 weak #3 —
            # per-collective launch cost rides ICI on real meshes).
            # OOB rows (owner==n, pos>=Cr) drop; unscattered slots keep
            # the sentinel words / zero counts.
            payload = jnp.stack(
                list(skey)
                + [jax.lax.bitcast_convert_type(scounts, jnp.uint32)],
                axis=1,
            )  # (m, WK+1)
            init = jnp.concatenate(
                [
                    jnp.full((n, Cr, WK), SENTINEL),
                    jnp.zeros((n, Cr, 1), jnp.uint32),
                ],
                axis=2,
            )
            send = init.at[sowner, pos].set(payload, mode="drop")
            recv = jax.lax.all_to_all(
                send, AXIS, split_axis=0, concat_axis=0
            )
            recv_p = [
                recv[:, :, w].reshape(plan.recv_per_batch)
                for w in range(WK)
            ]
            recv_c = jax.lax.bitcast_convert_type(
                recv[:, :, WK], jnp.int32
            )
            over = over + jnp.sum(
                (scounts > 0) & (sowner < n) & (pos >= Cr)
            ).astype(jnp.int32)[None]

            return bucketize_append(
                jnp.stack(recv_p, axis=0),
                recv_c.reshape(plan.recv_per_batch),
                buf_p, buf_c, over, slot,
            )

        # superkmer routing constants (routing == "superkmer")
        mlen = self.minimizer_size
        max_span = self.max_span
        SKL = max_span + k - 1                  # bases per record row
        RW = (SKL + 15 + 15) // 16              # packed words per record
        Csk = plan.send_cap
        if self.repartition is not None:
            repart_dev = jnp.asarray(self.repartition, jnp.int32)
        else:
            repart_dev = None

        def route_shard_sk(batch, bids, buf_p, buf_c, over, slot, pass_sel):
            """Superkmer-compressed routing (reference CHANGELOG.md:13):
            consecutive windows sharing a (strand-symmetric) minimizer
            travel as one (meta, packed bases) record over the
            all_to_all; the OWNER unpacks and extracts canonical kmers.
            ICI bytes per window ~ (RW+1)/span vs (WK+1) for hash routing.
            """
            from dsk_tpu.kmer.minimizer import (
                superkmer_records,
                unpack_records_to_rows,
            )

            B = plan.rows_per_chip
            nw = plan.nw
            m = plan.m
            rec_mins, is_rec, span2d, packed, _ = superkmer_records(
                batch, k, mlen, max_span
            )
            PWrow = packed.shape[1]
            mins_f = rec_mins.reshape(m)
            span_f = span2d.reshape(m)
            is_rec_f = is_rec.reshape(m)
            if repart_dev is not None:
                owner = repart_dev[
                    jnp.clip(mins_f, 0, repart_dev.shape[0] - 1).astype(
                        jnp.int32
                    )
                ] % jnp.int32(n)
            else:
                owner = (
                    kmer_hash_planes((mins_f,)) % jnp.uint32(n)
                ).astype(jnp.int32)
            owner = jnp.where(is_rec_f, owner, n)

            # compact records: 1-key owner sort carrying the flat index
            idx0 = jnp.arange(m, dtype=jnp.int32)
            sowner, sidx = jax.lax.sort((owner, idx0), num_keys=1)
            idx = jnp.arange(m, dtype=jnp.int32)
            is_new = jnp.ones((m,), jnp.bool_).at[1:].set(
                sowner[1:] != sowner[:-1]
            )
            group_start = jax.lax.cummax(jnp.where(is_new, idx, 0), axis=0)
            pos = idx - group_start

            srow = sidx // nw
            scol = sidx % nw
            sspan = jnp.take(span_f, sidx)
            sbank = jnp.take(bids.astype(jnp.uint32), srow)
            bit_off = (scol % 16).astype(jnp.uint32)
            meta = (
                bit_off
                | (sspan.astype(jnp.uint32) << 4)
                | (sbank << 11)
            )
            live = sowner < n

            # ONE scatter + ONE all_to_all for meta + all RW packed-base
            # words (stacked (n, Csk, RW+1) payload — single collective
            # launch per scan step, VERDICT r2 weak #3)
            packed_flat = packed.reshape(B * PWrow)
            cols = [jnp.where(live, meta, 0)]
            for t in range(RW):
                wi = jnp.clip(scol // 16 + t, 0, PWrow - 1)
                wvals = jnp.take(packed_flat, srow * PWrow + wi)
                cols.append(jnp.where(live, wvals, 0))
            payload = jnp.stack(cols, axis=1)  # (m, RW+1)
            send = (
                jnp.zeros((n, Csk, RW + 1), jnp.uint32)
                .at[sowner, pos]
                .set(payload, mode="drop")
            )
            recv = jax.lax.all_to_all(
                send, AXIS, split_axis=0, concat_axis=0
            )
            recv_meta = recv[:, :, 0].reshape(n * Csk)
            recv_words = [
                recv[:, :, 1 + t].reshape(n * Csk) for t in range(RW)
            ]
            over = over + jnp.sum(
                live & (pos >= Csk)
            ).astype(jnp.int32)[None]

            # owner side: reconstruct code rows and extract
            R = n * Csk
            words_rx = jnp.stack(recv_words, axis=1)  # (R, RW)
            off_rx = (recv_meta & 15).astype(jnp.int32)
            span_rx = ((recv_meta >> 4) & 127).astype(jnp.int32)
            bank_rx = (recv_meta >> 11).astype(jnp.uint32)
            codes_rx = unpack_records_to_rows(words_rx, off_rx, SKL)
            jpos = jnp.arange(SKL, dtype=jnp.int32)[None, :]
            codes_rx = jnp.where(
                jpos < (span_rx[:, None] + (k - 1)), codes_rx, jnp.uint8(0xFF)
            )
            planes, valid = extract_canonical_planes_jnp(codes_rx, k)
            flat = planes.reshape(W, R * max_span)
            weights = valid.reshape(R * max_span).astype(jnp.int32)
            if per_bank:
                bank_row = jnp.repeat(bank_rx, max_span)
                bank_row = jnp.where(weights > 0, bank_row, SENTINEL)
                flat = jnp.concatenate([flat, bank_row[None, :]], axis=0)
            flat, weights = maybe_pass_filter(flat, weights, pass_sel)
            return bucketize_append(flat, weights, buf_p, buf_c, over, slot)

        def flush_shard(buf_p, buf_c, tab_p, tab_c, over, tover):
            """Per-chip merge of the group buffer into the persistent
            table (the per-partition sort of the reference, C4).

            S == 1: one flat 1D sum_by_key over buffer + table.  (A
            (1, R) "batched" lax.sort hits a much slower XLA variant
            than the plain 1D sort — measured 6x on v5e — so the flat
            path keeps the 1D kernel.)
            S > 1, flat buffer (bucketize_at="flush"): partition the
            whole group's rows into S key-space buckets with ONE 1-key
            sort, then a BATCHED sum_by_key over (S, flush_cols + capb)
            rows merges each bucket with the matching bucket of the
            table — the table never re-sorts as one flat array.
            S > 1, route-bucketized: buffer arrives pre-bucketized."""
            if S == 1:
                if self.flush_mode == "merge":
                    # sort only the NEW rows; the persistent table is
                    # already sorted (live prefix + sentinel tail), so a
                    # bitonic merge network folds it in with ceil(log2 N)
                    # elementwise stages instead of a second full sort
                    from dsk_tpu.kmer.device import sum_by_key_presorted

                    s = jax.lax.sort(
                        tuple(buf_p[w, 0] for w in range(WK))
                        + (buf_c[0],),
                        num_keys=WK,
                    )
                    uniq, counts, n_uniq, wrapped = sum_by_key_presorted(
                        tuple(s[:WK]), s[WK],
                        tuple(tab_p[w] for w in range(WK)), tab_c,
                    )
                    tover = tover + (
                        (n_uniq > plan.table_cap).astype(jnp.int32)
                        + (wrapped << WRAP_SHIFT)
                    )[None]
                    new_p = jnp.stack(
                        [u[: plan.table_cap] for u in uniq], axis=0
                    )
                    new_c = counts[: plan.table_cap]
                    return buf_p, buf_c, new_p, new_c, over, tover
                from dsk_tpu.kmer.device import sum_by_key_planes_capped

                if n == 1:
                    # WEIGHTLESS flush sort (PERF.md round 3): the
                    # single-chip fill path appends UNIT weights and
                    # both the extractor and the pass filter sentinel-
                    # mask dead windows, so liveness (= NOT all-words-
                    # sentinel; a real canonical kmer is never all-
                    # sentinel — design invariant) IS the weight.  The
                    # big sort therefore moves only the WK key planes
                    # (8 B/row at k=31 instead of 12: the flush sort is
                    # bandwidth-bound), weights are reconstructed from
                    # the sorted keys, the buffer is compacted alone,
                    # and the table folds in with a SMALL 3-operand
                    # sort over 2*cap concatenated rows.  (First cut
                    # folded the table with the bitonic-merge network
                    # instead: k=31 ceiling rose 112.9 -> 130 but k=63
                    # CRATERED to 45.7 Mbases/s — 22 merge stages over
                    # (W+1) cap-sized operands re-learned round 2's
                    # merge-flush lesson.  The flat fold restores k63.)
                    s = jax.lax.sort(
                        tuple(buf_p[w, 0] for w in range(WK)),
                        num_keys=WK,
                    )
                    from dsk_tpu.kmer.device import compact_heads_unit

                    # unit-weight compaction: no cumsum pass, and the
                    # two-stage segment sorts carry (ckey, planes) only
                    # — run totals come from head-position diffs
                    buniq, bcounts, bn_uniq, n_lost = compact_heads_unit(
                        tuple(s), plan.table_cap,
                        segments=self.compact_segments,
                    )
                    planes = tuple(
                        jnp.concatenate([buniq[w], tab_p[w]])
                        for w in range(WK)
                    )
                    weights = jnp.concatenate([bcounts, tab_c])
                    uniq, counts, n_uniq, _fl, wrapped = (
                        sum_by_key_planes_capped(
                            planes, weights, plan.table_cap, segments=0
                        )
                    )
                    tover = tover + (
                        (
                            (n_uniq > plan.table_cap)
                            | (bn_uniq > plan.table_cap)
                            | (n_lost > 0)
                        ).astype(jnp.int32)
                        + (wrapped << WRAP_SHIFT)
                    )[None]
                    new_p = jnp.stack(uniq, axis=0)
                    return buf_p, buf_c, new_p, counts, over, tover

                planes = tuple(
                    jnp.concatenate([buf_p[w, 0], tab_p[w]])
                    for w in range(WK)
                )
                weights = jnp.concatenate([buf_c[0], tab_c])
                uniq, counts, n_uniq, n_lost, wrapped = (
                    sum_by_key_planes_capped(
                        planes, weights, plan.table_cap,
                        segments=self.compact_segments,
                    )
                )
                tover = tover + (
                    ((n_uniq > plan.table_cap) | (n_lost > 0)).astype(
                        jnp.int32
                    )
                    + (wrapped << WRAP_SHIFT)
                )[None]
                new_p = jnp.stack(uniq, axis=0)
                return buf_p, buf_c, new_p, counts, over, tover
            capb = plan.table_cap // S
            tp3 = tab_p.reshape(WK, S, capb)
            tc2 = tab_c.reshape(S, capb)
            if flat_buffer:
                bb_p, bb_c, n_over = partition_by_bucket(
                    buf_p.reshape(WK, -1), buf_c.reshape(-1),
                    plan.flush_cols,
                )
                over = over + n_over[None]
            else:
                bb_p, bb_c = buf_p, buf_c
            planes = tuple(
                jnp.concatenate([bb_p[w], tp3[w]], axis=1)
                for w in range(WK)
            )
            weights = jnp.concatenate([bb_c, tc2], axis=1)
            uniq, counts, n_uniq, wrapped = sum_by_key_planes_2d(
                planes, weights
            )
            tover = tover + (
                jnp.sum((n_uniq > capb).astype(jnp.int32))
                + (wrapped << WRAP_SHIFT)
            )[None]
            new_p = jnp.stack(
                [u[:, :capb] for u in uniq], axis=0
            ).reshape(WK, plan.table_cap)
            new_c = counts[:, :capb].reshape(plan.table_cap)
            return buf_p, buf_c, new_p, new_c, over, tover

        def hist_shard(tab_c):
            # int32 bins on device (TPU has no native int64); widened on host
            mask = tab_c > 0
            bins = jnp.where(mask, jnp.clip(tab_c, 1, self.nb_bins), 0)
            h = jnp.zeros(self.nb_bins + 1, jnp.int32)
            h = h.at[bins].add(mask.astype(jnp.int32)).at[0].set(0)
            return jax.lax.psum(h, AXIS)

        pp = P(None, AXIS)  # plane arrays: (W, n*cap) sharded on last axis
        pb = P(AXIS)        # vectors sharded on leading axis
        pr = P()            # replicated
        # check_vma=False: pallas_call outputs have no varying-mesh-axes
        # annotation; all our shardings are explicit in in/out_specs
        shmap = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)

        capb_live = plan.table_cap // plan.S
        self._live = jax.jit(
            lambda tc: jnp.sum(
                (tc > 0).reshape(plan.n, plan.S, capb_live),
                axis=2, dtype=jnp.int32,
            )
        )

        if self.spill:
            self._build_spill(
                fill_shard, shmap, pp, pb, pr
            )
            return

        if n == 1:
            route_body = fill_shard
        elif self.routing == "superkmer":
            route_body = route_shard_sk
        else:
            route_body = route_shard
        G = plan.buf_batches

        row_len = self.row_len

        def step_group_shard(bwords, bbitmap, bids, tab_p, tab_c, over,
                             tover, pass_sel):
            """ONE dispatch per flush group: lax.scan of G route steps
            into a program-local buffer, then the flush merge.  The axon
            tunnel charges ~6.5 ms per dispatch (measured round 2), so at
            one dispatch per BATCH the pipeline was dispatch-bound; the
            fused group program pays it once per ~G x m windows.

            Batches arrive 2-bit PACKED (io/packed.py: 16-base uint32
            words + validity as either per-row sparse exception meta,
            ~2.3 bits/base, or a 32-base dense bitmap, 3 bits/base —
            self.wire) instead of 8 bits/base over the host->device
            link, and are unpacked per scan step so only one batch's
            byte codes ever materialize in HBM.

            bwords: (G, rows_per_chip, ceil(L/16)) uint32;
            bbitmap: (G, rows_per_chip, 1+E) uint16 exc meta or
                     (G, rows_per_chip, ceil(L/32)) uint32 bitmap;
            bids: (G, rows_per_chip).
            """
            from dsk_tpu.io.packed import (
                unpack_codes_exc_jnp,
                unpack_codes_jnp,
            )

            unpack = (
                unpack_codes_exc_jnp if self.wire == "exc"
                else unpack_codes_jnp
            )
            Sb = 1 if flat_buffer else S
            buf_p0 = jnp.full(
                (WK, Sb, plan.buf_batches * C), SENTINEL
            )
            buf_c0 = jnp.zeros((Sb, plan.buf_batches * C), jnp.int32)

            def body(carry, xs):
                bp, bc, ov = carry
                words, bitmap, bid, slot = xs
                batch = unpack(words, bitmap, row_len)
                bp, bc, ov = route_body(
                    batch, bid, bp, bc, ov, slot, pass_sel
                )
                return (bp, bc, ov), None

            (buf_p, buf_c, over), _ = jax.lax.scan(
                body,
                (buf_p0, buf_c0, over),
                (bwords, bbitmap, bids, jnp.arange(G, dtype=jnp.int32)),
            )
            _, _, tab_p, tab_c, over, tover = flush_shard(
                buf_p, buf_c, tab_p, tab_c, over, tover
            )
            return tab_p, tab_c, over, tover

        self._step = jax.jit(
            shmap(
                step_group_shard,
                in_specs=(P(None, AXIS, None), P(None, AXIS, None),
                          P(None, AXIS), pp, pb, pb, pb, pr),
                out_specs=(pp, pb, pb, pb),
            ),
            donate_argnums=(3, 4, 5, 6),
        )
        self._hist = jax.jit(
            shmap(hist_shard, in_specs=(pb,), out_specs=pr)
        )
    def _build_spill(self, fill_shard, shmap, pp, pb, pr):
        """Spill-mode device programs (dist/spill.py's device half).

        _step_spill — the fill phase: one dispatch per flush group, as
        in the table engine, but the group buffer is DEDUPED (weightless
        sort + unit-weight compaction: the single-chip flush invariant
        holds on every chip here because spill fill never routes — each
        chip appends its own extracted windows with unit weights), then
        PARTITION-SORTED by the kmer hash so the records leave the
        device grouped by host bucket, boundaries attached.  The analog
        of DSK writing hash-routed kmers to partition files
        (doc/paper.tex:71-76) — with the added group-level dedup, so
        spill traffic never exceeds DSK's disk traffic.

        _spill_merge — the count phase: chip j folds a chunk of
        partition batch[j]'s records into its HBM table (weighted
        sort + segment-reduce; counts are weights because fill already
        collapsed duplicates per group).  The per-partition counting of
        the reference (SURVEY.md P4), partition-parallel over chips,
        collective-free."""
        plan, WK, W = self.plan, self.WK, self.W
        k = self.k
        n = plan.n
        G = plan.buf_batches
        C = plan.bucket_cols
        row_len = self.row_len
        n_passes = self.n_passes
        P_ = self.spill_partitions
        Nbuf = G * C
        cap = plan.table_cap
        from dsk_tpu.io.packed import (
            unpack_codes_exc_jnp,
            unpack_codes_jnp,
        )
        from dsk_tpu.kmer.device import (
            compact_heads_unit,
            sum_by_key_planes_capped,
        )

        unpack = (
            unpack_codes_exc_jnp if self.wire == "exc" else unpack_codes_jnp
        )

        def spill_group_shard(bwords, bbitmap, bids, over, pass_sel):
            buf_p0 = jnp.full((WK, 1, Nbuf), SENTINEL)
            buf_c0 = jnp.zeros((1, Nbuf), jnp.int32)

            def body(carry, xs):
                bp, bc, ov = carry
                words, bitmap, bid, slot = xs
                batch = unpack(words, bitmap, row_len)
                bp, bc, ov = fill_shard(
                    batch, bid, bp, bc, ov, slot, pass_sel
                )
                return (bp, bc, ov), None

            (buf_p, buf_c, over), _ = jax.lax.scan(
                body,
                (buf_p0, buf_c0, over),
                (bwords, bbitmap, bids, jnp.arange(G, dtype=jnp.int32)),
            )
            # weightless group dedup (liveness == unit weight; see
            # flush_shard's single-chip path for the invariant)
            s = jax.lax.sort(
                tuple(buf_p[w, 0] for w in range(WK)), num_keys=WK
            )
            uniq, counts, _n_uniq, _ = compact_heads_unit(
                tuple(s), Nbuf, segments=0
            )
            # partition-sort by the routing hash (host split must agree:
            # dist/spill.py kmer_hash_planes_np is the bit-exact mirror)
            pid = kmer_hash_planes(tuple(uniq[:W])) % jnp.uint32(P_)
            pidk = jnp.where(counts > 0, pid, jnp.uint32(P_))
            s2 = jax.lax.sort(
                (pidk,) + tuple(uniq) + (counts,), num_keys=1
            )
            bounds = jnp.searchsorted(
                s2[0], jnp.arange(P_ + 1, dtype=jnp.uint32)
            ).astype(jnp.int32)
            planes = jnp.stack(s2[1 : 1 + WK], axis=0)
            return planes, s2[1 + WK], bounds[None, :], over

        self._step_spill = jax.jit(
            shmap(
                spill_group_shard,
                in_specs=(P(None, AXIS, None), P(None, AXIS, None),
                          P(None, AXIS), pb, pr),
                out_specs=(pp, pb, P(AXIS, None), pb),
            ),
            donate_argnums=(3,),
        )

        Rc = self.spill_chunk_rows
        n_merge = Rc + cap
        cs = 1
        while n_merge // (cs * 2) >= (1 << 17):
            cs *= 2
        self._spill_merge_segments = cs

        def merge_shard(rec_p, rec_c, tab_p, tab_c, tover):
            planes = tuple(
                jnp.concatenate([rec_p[w], tab_p[w]]) for w in range(WK)
            )
            weights = jnp.concatenate([rec_c, tab_c])
            uniq, counts, n_uniq, n_lost, wrapped = (
                sum_by_key_planes_capped(
                    planes, weights, cap, segments=cs
                )
            )
            tover = tover + (
                ((n_uniq > cap) | (n_lost > 0)).astype(jnp.int32)
                + (wrapped << WRAP_SHIFT)
            )[None]
            return jnp.stack(uniq, axis=0), counts, tover

        self._spill_merge = jax.jit(
            shmap(
                merge_shard,
                in_specs=(pp, pb, pp, pb, pb),
                out_specs=(pp, pb, pb),
            ),
            donate_argnums=(2, 3, 4),
        )
        # fill-phase over init (tiny; the big tables init per count batch
        # through _init_state)
        sh_b = NamedSharding(self.mesh, P(AXIS))
        self._spill_over_init = jax.jit(
            lambda: jnp.zeros((n,), jnp.int32), out_shardings=sh_b
        )

    def compile(self, progress=None, cache_dir: str | None = None
                ) -> "DistCountEngine":
        """Ahead-of-time compile the pass programs (step, hist) and swap
        the jit wrappers for the compiled executables.

        jax's jit dispatch cache is not populated by .lower().compile(),
        so the compiled objects replace the wrappers directly.  Warm
        starts are served by jax's PERSISTENT COMPILATION CACHE (enabled
        here): the big fused step program costs minutes on the remote
        TPU compile service cold, ~1 s from the cache, and the restored
        executable first-executes fast (~0.5 s measured).

        History (round 2): an earlier design cached SERIALIZED
        executables (jax.experimental.serialize_executable, a 114 MB
        payload per program).  On the axon remote-compile backend that
        is a trap: deserialize_and_load returns in <1 s, but the FIRST
        EXECUTION then pays a server-side rebuild measured at 216-244 s
        — the same cost as the compile it claimed to skip, silently
        moved into the first step dispatch of the stream.  The
        persistent cache (zstd-compressed, ~7 MB/program) restores
        through the normal compile path without that penalty, so the
        whole two-level executable cache was deleted in its favor.
        Set DSK_TPU_AOT_CACHE=0 to compile uncached."""
        import time as _time

        import jax.numpy as _jnp

        from dsk_tpu.io.packed import packed_shapes

        plan, WK = self.plan, self.WK
        rows = self.rows_per_chip * plan.n
        G = plan.buf_batches
        nw, nb = packed_shapes(self.row_len)
        bg = jax.ShapeDtypeStruct((G, rows, nw), _jnp.uint32)
        if self.wire == "exc":
            bm = jax.ShapeDtypeStruct(
                (G, rows, 1 + self.wire_E), _jnp.uint16
            )
        else:
            bm = jax.ShapeDtypeStruct((G, rows, nb), _jnp.uint32)
        bi = jax.ShapeDtypeStruct((G, rows), _jnp.int32)
        tp = jax.ShapeDtypeStruct((WK, plan.n * plan.table_cap), _jnp.uint32)
        tc = jax.ShapeDtypeStruct((plan.n * plan.table_cap,), _jnp.int32)
        ov = jax.ShapeDtypeStruct((plan.n,), _jnp.int32)
        sc = jax.ShapeDtypeStruct((), _jnp.int32)

        _enable_persistent_cache(cache_dir)
        if self.spill:
            Rc = self.spill_chunk_rows
            rp = jax.ShapeDtypeStruct(
                (self.WK, plan.n * Rc), _jnp.uint32
            )
            rc = jax.ShapeDtypeStruct((plan.n * Rc,), _jnp.int32)
            programs = [
                ("spill_step", "_step_spill", (bg, bm, bi, ov, sc)),
                ("spill_merge", "_spill_merge", (rp, rc, tp, tc, ov)),
            ]
        else:
            programs = [
                ("step", "_step", (bg, bm, bi, tp, tc, ov, ov, sc)),
                ("hist", "_hist", (tc,)),
            ]
        if self.n == 1 and not self.multi_process:
            # live-prefix helper for the gather path (single-chip only:
            # AOT avals carry no sharding, fine when nothing is sharded)
            programs.append(("live", "_live", (tc,)))
        for name, fn, args in programs:
            t0 = _time.perf_counter()
            # location-free lowering: without it a pure line shift in any
            # traced file changes the StableHLO (Mosaic payloads embed
            # trace-time source locations) and defeats the persistent
            # cache's content key
            with _locfree():
                compiled = getattr(self, fn).lower(*args).compile()
            setattr(self, fn, compiled)
            if progress:
                progress(
                    f"compiled {name} in {_time.perf_counter() - t0:.1f}s"
                )
        return self

    def _init_state(self):
        plan, W = self.plan, self.WK
        mesh = self.mesh
        sh_p = NamedSharding(mesh, P(None, AXIS))
        sh_b = NamedSharding(mesh, P(AXIS))

        if self.multi_process:
            # each process materializes only its addressable shards
            def full(shape, sharding, value, dtype):
                def cb(idx):
                    sub = tuple(
                        len(range(*sl.indices(dim)))
                        for sl, dim in zip(idx, shape)
                    )
                    return np.full(sub, value, dtype)

                return jax.make_array_from_callback(shape, sharding, cb)
        else:
            # ONE jitted device-side fill for all four arrays: host
            # numpy + device_put costs a (W+1)*cap*4-byte H2D transfer
            # through the tunnel (~30 MB at k=63 — measured as a fake
            # 1.9x "regression" in bench round 3 when the init landed
            # inside a timed region, and real multipass runs pay it per
            # pass); per-array EAGER jnp.full would instead dispatch a
            # remote compile per array.  A single jit = one cached
            # compile, zero wire, HBM-speed fills.
            if not hasattr(self, "_init_fn"):
                n_cap = plan.n * plan.table_cap

                def mk():
                    return (
                        jnp.full((W, n_cap), SENTINEL, jnp.uint32),
                        jnp.zeros((n_cap,), jnp.int32),
                        jnp.zeros((plan.n,), jnp.int32),
                        jnp.zeros((plan.n,), jnp.int32),
                    )

                self._init_fn = jax.jit(
                    mk, out_shardings=(sh_p, sh_b, sh_b, sh_b)
                )
            return self._init_fn()

        tab_p = full((W, plan.n * plan.table_cap), sh_p, SENTINEL, np.uint32)
        tab_c = full((plan.n * plan.table_cap,), sh_b, 0, np.int32)
        over = full((plan.n,), sh_b, 0, np.int32)
        tover = full((plan.n,), sh_b, 0, np.int32)
        return tab_p, tab_c, over, tover

    # -- driver ----------------------------------------------------------

    def count(
        self,
        bank: Bank | str,
        per_bank: bool = False,
        n_passes: int | None = None,
        cache_dir: str | None = None,
        done_passes: dict[int, CountResult] | None = None,
        on_pass=None,
        progress_cb=None,
        n_workers: int = 1,
        max_disk_mb: int = 0,
        pass_sink=None,
        pass_sink_per_bank=None,
        resume_state=None,
        spill_ckpt=None,
    ) -> CountResult:
        """Same driver contract as CountEngine.count (checkpoint hooks,
        batch cache, prefetch).  per_bank requires an engine constructed
        with per_bank=True (the bank-id key word changes program shapes).

        resume_state: a count_stream retry snapshot (single-pass only —
        multipass runs preserve work at pass granularity through the
        checkpoint machinery instead).  The first `groups` flush groups'
        batches are consumed from the reader WITHOUT pack/wire/device
        work (the reader's batch order is deterministic for fixed
        reader params, io/batch.py), and the device tables start from
        the snapshot — the reference analog of never re-reading counted
        partitions (doc/paper.tex:71-76).  The snapshot must come from
        an engine with the SAME table geometry and reader params (the
        retry valve only changes send_slack, which affects neither).

        pass_sink(pass_id, partition_id, kmers, counts): the BOUNDED-
        MEMORY output path (VERDICT r2 missing #2).  After each pass the
        engine hands every chip's table to the sink ONE CHIP AT A TIME
        (iter_partitions) instead of materializing + lexsorting the
        global table on the host: peak host memory is one chip's live
        table (<= table_cap), independent of total distinct count — the
        reference's "memory exactly M" contract (doc/paper.tex:106-115;
        2.7B kmers in 4 GB, doc/human_log:4,23).  Pass tables are
        DISJOINT in kmer space (decorrelated pass hash), so appending
        each pass's sorted rows per partition is a complete merge; no
        global re-sort is needed.  The returned CountResult is slim
        (histogram + info, empty kmers/counts).  Incompatible with
        per_bank."""
        if per_bank and not self.per_bank:
            raise ValueError(
                "per-bank counting needs DistCountEngine(per_bank=True)"
            )
        if pass_sink is not None and per_bank:
            raise ValueError(
                "per-bank streaming uses pass_sink_per_bank (the sink "
                "receives the grouped bank matrix per partition)"
            )
        if pass_sink_per_bank is not None:
            if not per_bank:
                raise ValueError(
                    "pass_sink_per_bank requires per_bank=True"
                )
            pass_sink = _PerBankSink(pass_sink_per_bank)
        if isinstance(bank, str):
            bank = open_bank(bank)
        if isinstance(pass_sink, _PerBankSink):
            pass_sink.nb_banks = bank.nb_banks
        n_passes = self.n_passes if n_passes is None else n_passes
        if n_passes != self.n_passes:
            raise ValueError(
                f"engine was built for n_passes={self.n_passes}, got {n_passes}"
            )
        if self.spill:
            return self._count_spilled(
                bank, n_passes=n_passes, cache_dir=cache_dir,
                done_passes=done_passes, on_pass=on_pass,
                progress_cb=progress_cb, n_workers=n_workers,
                max_disk_mb=max_disk_mb, pass_sink=pass_sink,
                resume_state=resume_state, spill_ckpt=spill_ckpt,
            )
        from dsk_tpu.io.prefetch import prefetch

        # multi-process meshes: each host reads only its share, sized for
        # its own chips (lockstep padding happens in count_stream)
        reader_rows = (
            self.local_batch_rows if self.multi_process else self.batch_rows
        )
        if resume_state is not None and n_passes > 1:
            raise ValueError(
                "resume_state is single-pass only (multipass work is "
                "preserved at pass granularity via checkpoints)"
            )
        if n_passes <= 1:
            batches = batch_iterator(
                bank, self.k, reader_rows, self.row_len,
                n_workers=n_workers,
            )
            if resume_state is not None:
                import itertools

                batches = itertools.islice(
                    batches,
                    resume_state["groups"] * self.plan.buf_batches,
                    None,
                )
            res = self.count_stream(
                prefetch(batches),
                nb_banks=bank.nb_banks,
                progress_cb=progress_cb,
                finalize=pass_sink is None,
                resume_state=resume_state,
            )
            if pass_sink is not None:
                res.info["partition_sizes"] = self._emit_pass(pass_sink, 0)
                if isinstance(pass_sink, _PerBankSink):
                    res.histogram = pass_sink.hist
            if on_pass is not None:
                on_pass(0, res)
            return res
        from dsk_tpu.engine.counter import multipass_batches

        done_passes = done_passes or {}
        results = []
        for p, batches in multipass_batches(
            bank, self.k, reader_rows, self.row_len, n_passes, cache_dir,
            n_workers=n_workers, max_disk_mb=max_disk_mb,
        ):
            if p in done_passes:
                if p == 0 and len(done_passes) < n_passes:
                    for _ in batches:
                        pass
                results.append(done_passes[p])
                continue
            res = self.count_stream(
                batches, nb_banks=bank.nb_banks, pass_id=p,
                progress_cb=progress_cb,
                finalize=pass_sink is None,
            )
            if pass_sink is not None:
                res.info["partition_sizes"] = self._emit_pass(pass_sink, p)
                if isinstance(pass_sink, _PerBankSink):
                    res.histogram = pass_sink.hist
            if on_pass is not None:
                on_pass(p, res)
            results.append(res)
        # slim per-pass results (empty kmers) concatenate to an empty
        # table: merge_pass_results then just sums the histograms
        return merge_pass_results(results)

    def _emit_pass(self, pass_sink, pass_id: int) -> list[int]:
        """Stream this pass's tables to the sink, one chip at a time,
        then drop the device references (the next pass re-inits)."""
        if isinstance(pass_sink, _PerBankSink):
            return self._emit_pass_per_bank(pass_sink, pass_id)
        sizes = []
        for p, kk, cc in self.iter_partitions():
            pass_sink(pass_id, p, kk, cc)
            sizes.append(int(kk.shape[0]))
        self._last_state = None
        return sizes

    def _emit_pass_per_bank(self, sink: _PerBankSink, pass_id: int
                            ) -> list[int]:
        """Per-bank bounded emit (VERDICT r3 weak #5): each chip's
        (kmer, bank) rows are grouped per kmer ON THAT CHIP'S GATHER
        (complete: the owner hash ignores the bank plane) and handed to
        the sink as (kmers, total counts, bank matrix) — histo2D /
        solidity-kind runs never materialize the global table.  The
        per-pass histogram accumulates here (over grouped totals, the
        reference's per-kmer abundance spectrum)."""
        from dsk_tpu.engine.counter import _group_by_kmer

        sizes = []
        hist = np.zeros(self.nb_bins + 1, np.int64)
        for p, rows, cc in self.iter_partitions():
            kk, tot, bmat = _group_by_kmer(rows, cc, self.W, sink.nb_banks)
            if tot.size:
                hist += np.bincount(
                    np.clip(tot, 1, self.nb_bins),
                    minlength=self.nb_bins + 1,
                ).astype(np.int64)
            sink.fn(pass_id, p, kk, tot, bmat)
            sizes.append(int(kk.shape[0]))
        sink.hist = hist
        self._last_state = None
        return sizes

    # -- spill mode (dist/spill.py; VERDICT r3 missing #2) ---------------

    def _count_spilled(
        self, bank, n_passes=1, cache_dir=None, done_passes=None,
        on_pass=None, progress_cb=None, n_workers=1, max_disk_mb=0,
        pass_sink=None, resume_state=None, spill_ckpt=None,
    ) -> CountResult:
        """Spill-mode pass driver: fill (stream + spill to host
        partition buckets) then count (partition-parallel merge over
        chips), per pass — DSK's exact two-phase loop
        (doc/paper.tex:71-91) with HBM as the sort arena and host
        RAM/disk as the partition store.  Peak disk = ONE pass's spill
        (buckets are deleted as each pass completes); peak HBM = the
        fill buffer + n count tables, independent of total distinct.

        max_disk_mb bounds the spill store per pass (SpillDiskOverflow
        -> the run.py more-passes valve — the reference's
        n_iters = ceil(v*b/D), doc/paper.tex:66); the multipass batch
        cache shares the same budget value independently."""
        import os
        import tempfile
        import uuid

        from dsk_tpu.dist.spill import SpillStore
        from dsk_tpu.io.prefetch import prefetch

        if resume_state is not None:
            raise ValueError(
                "spill mode preserves work at pass granularity, not via "
                "stream snapshots"
            )
        # resume granularity (VERDICT r4 weak #6 + round 5):
        #   full mid-pass (fill skip + count marks): needs a replayable
        #     sink (collect mode cannot reconstruct already-emitted
        #     partitions) and single-process (count marks would need
        #     cross-host consistency with the caller's store).
        #   FILL-ONLY (fill skip, count restarts): works everywhere —
        #     the bucket files are durable on the (shared) filesystem
        #     and the count phase rebuilds from them, so the expensive
        #     input-streaming half is never repeated.  Multi-process
        #     runs and collect-mode callers get this half.
        ckpt_fill_only = spill_ckpt is not None and (
            self.multi_process or pass_sink is None
        )
        ckpt_rank = jax.process_index() if self.multi_process else 0
        ckpt_hosts = jax.process_count() if self.multi_process else 1

        def _ckpt_fill_done(p):
            if spill_ckpt is None:
                return None
            if self.multi_process:
                done = spill_ckpt.fill_done_all(p, ckpt_hosts)
                stats = dict(done[ckpt_rank]) if done else None
            else:
                stats = spill_ckpt.fill_done(p)
                stats = dict(stats) if stats is not None else None
            if stats is not None:
                stats["fill_resumed"] = True
            return stats
        base = self.spill_dir or cache_dir or tempfile.gettempdir()
        if self.multi_process:
            # shared dir: every process must agree on a name that is
            # UNIQUE per run — a deterministic name would silently
            # append to stale bucket files from a crashed prior run
            # (SpillStore opens "ab").  Process 0's random tag is
            # broadcast through the device mesh.
            from jax.experimental import multihost_utils

            seed = np.zeros((2,), np.uint32)
            if jax.process_index() == 0:
                seed = np.frombuffer(os.urandom(8), np.uint32).copy()
            seed = np.asarray(
                multihost_utils.broadcast_one_to_all(seed)
            )
            run_tag = (
                f"dsk_tpu_spill_mp_{int(seed[0]):08x}{int(seed[1]):08x}"
            )
        else:
            run_tag = f"dsk_tpu_spill_{uuid.uuid4().hex}"

        # -max-disk covers BOTH the spill store and the multipass batch
        # cache, which live simultaneously during a pass: spill gets 3/4
        # and the cache 1/4 (the cache aborts gracefully into re-reads
        # on overrun; spill overrun is the typed more-passes valve).
        # The planner sizes n_passes_spill against the same 3/4.
        spill_budget = (
            max((max_disk_mb * 3) // 4, 1) if max_disk_mb > 0 else 0
        )
        cache_budget = (
            max(max_disk_mb - spill_budget, 1) if max_disk_mb > 0 else 0
        )

        def run_pass(p, batches):
            root = (
                spill_ckpt.pass_dir(p)
                if spill_ckpt is not None
                else os.path.join(base, run_tag, f"pass{p}")
            )
            spill = SpillStore(
                root,
                self.WK,
                max_disk_mb=spill_budget,
                host=jax.process_index() if self.multi_process else 0,
                n_hosts=jax.process_count() if self.multi_process else 1,
                hash_words=self.W,  # never the bank plane (per-bank mode)
            )
            ok = False
            try:
                stats = _ckpt_fill_done(p)
                if stats is not None:
                    # the fill's bucket files are whole on disk: skip
                    # the stream entirely — ZERO input re-reads.  (A
                    # multipass resume still tees pass 0's batches so
                    # the 2-bit cache serves the later passes.)
                    spill.restore_rows()
                    if p == 0 and n_passes > 1:
                        for _ in batches:
                            pass
                else:
                    if spill_ckpt is not None:
                        # deterministic dir: a stale partial fill must
                        # never be appended to (SpillStore opens "ab";
                        # reset touches only THIS host's files)
                        spill.reset()
                        spill_ckpt.clear_pass(p, host=ckpt_rank)
                    stats = self._spill_stream(
                        batches, spill, pass_id=p, progress_cb=progress_cb
                    )
                    if spill_ckpt is not None:
                        spill.flush_all()
                        spill_ckpt.save_fill(p, stats, host=ckpt_rank)
                if self.multi_process:
                    # every host's bucket files must be complete before
                    # any host reads them for its owned partitions
                    from jax.experimental import multihost_utils

                    spill.close()
                    multihost_utils.sync_global_devices(
                        f"dsk_tpu_spill_fill_{p}"
                    )
                res = self._count_partitions(
                    spill, p, pass_sink, stats, nb_banks=bank.nb_banks,
                    ckpt=spill_ckpt, ckpt_fill_only=ckpt_fill_only,
                )
                if self.multi_process:
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices(
                        f"dsk_tpu_spill_count_{p}"
                    )
                ok = True
                return res
            finally:
                if ok or spill_ckpt is None:
                    # keep the bucket files + manifest when a
                    # checkpointed pass DIES mid-way: they ARE the
                    # resume state.  Cleanup is own-host-only (shared
                    # dirs: peers clear their own files).
                    spill.delete()
                    if spill_ckpt is not None:
                        spill_ckpt.clear_pass(p, host=ckpt_rank)
                else:
                    spill.close()

        reader_rows = (
            self.local_batch_rows if self.multi_process else self.batch_rows
        )
        if n_passes <= 1:
            if _ckpt_fill_done(0) is not None:
                # the fill is durable on disk: never even START the
                # reader (prefetch spawns an eager thread) — the
                # resume's zero-input-reads guarantee
                batches0 = iter(())
            else:
                batches0 = prefetch(
                    batch_iterator(
                        bank, self.k, reader_rows, self.row_len,
                        n_workers=n_workers,
                    )
                )
            res = run_pass(0, batches0)
            if on_pass is not None:
                on_pass(0, res)
            return res
        from dsk_tpu.engine.counter import multipass_batches

        done_passes = done_passes or {}
        results = []
        for p, batches in multipass_batches(
            bank, self.k, reader_rows, self.row_len, n_passes,
            cache_dir, n_workers=n_workers, max_disk_mb=cache_budget,
        ):
            if p in done_passes:
                if p == 0 and len(done_passes) < n_passes:
                    for _ in batches:  # tee the cache for later passes
                        pass
                results.append(done_passes[p])
                continue
            res = run_pass(p, batches)
            if on_pass is not None:
                on_pass(p, res)
            results.append(res)
        return merge_pass_results(results)

    def _spill_stream(
        self, batches, spill, pass_id: int = 0, progress_cb=None
    ) -> dict:
        """Fill phase: stream packed groups through _step_spill and
        drain each group's partition-sorted records to the SpillStore on
        a writer thread (D2H overlaps the next group's compute; the
        device never blocks on the host bucket append)."""
        import time as _time
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        plan = self.plan
        G = plan.buf_batches
        sub = {"t_gen": 0.0, "t_put": 0.0, "t_feed": 0.0, "t_drain": 0.0}
        wire_bytes = [0]
        t0 = _time.perf_counter()
        over = self._spill_over_init()
        n_groups = 0
        n_bases = 0
        n_reads = 0
        spilled = [0]
        if self.multi_process:
            # SPMD contract: every process dispatches the same number of
            # (shard_mapped) spill steps; exhausted hosts pad
            from dsk_tpu.dist.multihost import lockstep_batches
            from dsk_tpu.io.batch import PAD, Batch

            rows = self.local_batch_rows

            def make_empty():
                return Batch(
                    np.full((rows, self.row_len), PAD, np.uint8),
                    np.zeros(rows, np.int32),
                    0,
                )

            batches = lockstep_batches(batches, make_empty, group=G)
        feed = self._feed_groups(batches, sub, wire_bytes)
        writer = ThreadPoolExecutor(1)
        pending: deque = deque()
        dbg = _spill_debug
        try:
            for item in feed:
                words_dev, bitmap_dev, bids_dev, bb, rr = item
                n_bases += bb
                n_reads += rr
                planes_dev, counts_dev, bounds_dev, over = (
                    self._step_spill(
                        words_dev, bitmap_dev, bids_dev, over,
                        jnp.int32(pass_id),
                    )
                )
                dbg(f"group {n_groups}: step dispatched")
                pending.append(
                    writer.submit(
                        self._drain_spill_group,
                        planes_dev, counts_dev, bounds_dev, spill, spilled,
                    )
                )
                # bound in-flight group outputs (HBM) and surface writer
                # errors (SpillDiskOverflow) promptly
                while len(pending) > 1:
                    pending.popleft().result()
                n_groups += 1
                if progress_cb is not None and n_groups % 8 == 0:
                    progress_cb(n_groups * G, n_bases, n_reads)
            d0 = _time.perf_counter()
            while pending:
                pending.popleft().result()
            sub["t_drain"] = _time.perf_counter() - d0
        finally:
            writer.shutdown(wait=True, cancel_futures=True)
        wall = max(_time.perf_counter() - t0, 1e-9)
        return {
            "n_bases": n_bases,
            "n_reads": n_reads,
            "t_stream": round(wall, 3),
            "t_sub": {k: round(v, 3) for k, v in sub.items()},
            "wire_mb": round(wire_bytes[0] / (1 << 20), 1),
            "wire_mb_per_s": round(wire_bytes[0] / (1 << 20) / wall, 1),
            "spill_rows": spilled[0],
            "spill_mb": round(
                spilled[0] * 4 * (self.WK + 1) / (1 << 20), 1
            ),
        }

    def _drain_spill_group(
        self, planes_dev, counts_dev, bounds_dev, spill, acc
    ) -> None:
        """Download one group's live records (parallel D2H chunk
        streams, live prefix only) and append them to the host buckets
        by the device-computed partition boundaries."""
        import time as _time

        dbg = _spill_debug
        plan, WK = self.plan, self.WK
        n, P_ = plan.n, self.spill_partitions
        Nbuf = planes_dev.shape[1] // n
        import contextlib

        wire_lock = getattr(self, "_wire_lock", None) or (
            contextlib.nullcontext()
        )
        if self.multi_process:
            # each host drains only its own chips' shards (whole-shard
            # fetches — slabbing the local shards is a real-pod perf
            # item; CPU-mesh shards are small)
            with wire_lock:
                self._drain_spill_group_local(
                    planes_dev, counts_dev, bounds_dev, spill, acc, Nbuf
                )
            return
        t0 = _time.perf_counter()
        with wire_lock:  # every drain D2H must serialize with the puts
            bounds = np.asarray(bounds_dev)  # (n, P_+1)
        dbg(f"drain: bounds in {_time.perf_counter() - t0:.1f}s")
        live = bounds[:, P_]
        m = int(live.max()) if live.size else 0
        if m == 0:
            return
        # SLAB fetch: the live prefix downloads in bounded slabs (one
        # compiled program with a runtime offset, T parallel chunk
        # streams per slab) instead of one giant multi-hundred-MB
        # transfer — the tunnel's reverse channel stalls on very large
        # single fetches (a 742 MB whole-prefix drain hung for 30+ min
        # at the 4-Gbase tier while 192 MB drains streamed at
        # 25-30 MB/s), and slabs also give per-slab progress
        slab = min(_SPILL_SLAB_ROWS, Nbuf)
        fetcher = _spill_slab_fetcher(
            WK, n, Nbuf, slab, _D2H_STREAMS,
            aot=(n == 1 and not self.multi_process),
        )
        from concurrent.futures import ThreadPoolExecutor

        T = _D2H_STREAMS
        tp_parts, tc_parts = [], []
        done = 0
        t0 = _time.perf_counter()
        total_mb = 0.0
        while done < m:
            st = max(min(done, Nbuf - slab), 0)
            with wire_lock:
                chunks = fetcher(planes_dev, counts_dev, np.int32(st))
                with ThreadPoolExecutor(T) as ex:
                    host = list(ex.map(np.asarray, chunks))
            total_mb += sum(h.nbytes for h in host) / (1 << 20)
            skip = done - st
            tp_parts.append(
                np.concatenate(host[:T]).reshape(WK, n, slab)[:, :, skip:]
            )
            tc_parts.append(
                np.concatenate(host[T:]).reshape(n, slab)[:, skip:]
            )
            done = st + slab
            dbg(f"drain: slab @{st} fetched ({done}/{m} rows)")
        dt = max(_time.perf_counter() - t0, 1e-9)
        dbg(f"drain: fetched {total_mb:.0f} MB in {dt:.1f}s "
            f"({total_mb/dt:.1f} MB/s)")
        tp = np.concatenate(tp_parts, axis=2)
        tc = np.concatenate(tc_parts, axis=1)
        for j in range(n):
            lj = int(live[j])
            if lj == 0:
                continue
            arr = np.empty((lj, WK + 1), np.uint32)
            arr[:, :WK] = tp[:, j, :lj].T
            arr[:, WK] = tc[j, :lj].view(np.uint32)
            for pid in range(P_):
                lo, hi = int(bounds[j, pid]), int(bounds[j, pid + 1])
                if hi > lo:
                    spill.append(pid, arr[lo:hi])
        acc[0] += int(live.sum())

    def _drain_spill_group_local(
        self, planes_dev, counts_dev, bounds_dev, spill, acc, Nbuf
    ) -> None:
        """Multi-process drain: download this host's chips' shards and
        append their partition slices to the host-suffixed bucket
        files (dist/spill.py)."""
        WK, P_ = self.WK, self.spill_partitions
        bounds_by_chip = {}
        for s in bounds_dev.addressable_shards:
            bounds_by_chip[s.index[0].start or 0] = np.asarray(s.data)[0]
        counts_by_chip = {}
        for s in counts_dev.addressable_shards:
            counts_by_chip[(s.index[0].start or 0) // Nbuf] = np.asarray(
                s.data
            )
        planes_by_chip = {}
        for s in planes_dev.addressable_shards:
            planes_by_chip[(s.index[1].start or 0) // Nbuf] = np.asarray(
                s.data
            )
        for j in sorted(counts_by_chip):
            b = bounds_by_chip[j]
            lj = int(b[P_])
            if lj == 0:
                continue
            tp = planes_by_chip[j]  # (WK, Nbuf)
            tc = counts_by_chip[j]  # (Nbuf,)
            arr = np.empty((lj, WK + 1), np.uint32)
            arr[:, :WK] = tp[:, :lj].T
            arr[:, WK] = tc[:lj].view(np.uint32)
            for pid in range(P_):
                lo, hi = int(b[pid]), int(b[pid + 1])
                if hi > lo:
                    spill.append(pid, arr[lo:hi])
            acc[0] += lj

    def _spill_prepare_partition(self, kk, cc, nb_banks):
        """Lock-free half of a spill partition emit: per-bank grouping
        (complete per partition — the routing hash covers the W kmer
        words only, spill_group_shard + SpillStore(hash_words=W), so
        every bank's copies of a kmer live in ONE partition) and the
        histogram increment over per-KMER totals (the reference's
        abundance spectrum counts kmers, not (kmer, bank) pairs).
        O(rows) numpy work — the multiproc workers run this OUTSIDE the
        shared emit lock so chips don't serialize on host grouping."""
        bmat = None
        if self.per_bank:
            from dsk_tpu.engine.counter import _group_by_kmer

            kk, cc, bmat = _group_by_kmer(kk, cc, self.W, nb_banks)
        hist_inc = (
            np.bincount(
                np.clip(cc, 1, self.nb_bins),
                minlength=self.nb_bins + 1,
            ).astype(np.int64)
            if cc.size
            else None
        )
        return kk, cc, bmat, hist_inc

    def _spill_emit_prepared(
        self, pass_id, pid, prep, pass_sink, hist, out_k, out_c, out_b
    ) -> int:
        """Serialized half of a spill partition emit (HDF5 appends and
        the shared accumulators are not thread-safe).  Returns the
        partition's distinct-kmer count."""
        kk, cc, bmat, hist_inc = prep
        if hist_inc is not None:
            hist += hist_inc
        n = int(kk.shape[0])
        if n == 0:
            return 0
        if pass_sink is not None:
            if isinstance(pass_sink, _PerBankSink):
                pass_sink.fn(pass_id, pid, kk, cc, bmat)
            else:
                pass_sink(pass_id, pid, kk, cc)
        else:
            out_k.append(kk)
            out_c.append(cc)
            if bmat is not None:
                out_b.append(bmat)
        return n

    def _spill_emit_partition(
        self, pass_id, pid, kk, cc, pass_sink, hist,
        out_k, out_c, out_b, nb_banks,
    ) -> int:
        """Single-threaded emit (prepare + emit in one call)."""
        return self._spill_emit_prepared(
            pass_id, pid,
            self._spill_prepare_partition(kk, cc, nb_banks),
            pass_sink, hist, out_k, out_c, out_b,
        )

    def _spill_collect_result(
        self, collect, out_k, out_c, out_b, nb_banks
    ):
        """Materialize the collect-mode table (empty when a sink drained
        it): (kmers, counts, bank_counts-or-None)."""
        if collect and out_k:
            kmers = np.concatenate(out_k, axis=0)
            counts = np.concatenate(out_c, axis=0).astype(np.int32)
            bank_counts = (
                np.concatenate(out_b, axis=0) if self.per_bank else None
            )
        else:
            kmers = np.empty(
                (0, self.W if (collect and self.per_bank) else self.WK),
                np.uint32,
            )
            counts = np.empty((0,), np.int32)
            bank_counts = (
                np.zeros((0, nb_banks), np.int64)
                if (collect and self.per_bank)
                else None
            )
        return kmers, counts, bank_counts

    def _count_partitions_multiproc(
        self, spill, pass_id: int, pass_sink, stats: dict,
        nb_banks: int = 1, ckpt=None,
    ) -> CountResult:
        """Multi-process count phase: host-LOCAL, collective-free.
        Partitions are owned by pid % n_hosts (split children inherit
        their parent's owner — no cross-host coordination) and dealt
        across this host's LOCAL CHIPS (VERDICT r4 weak #2: one worker
        thread per addressable device, each merging whole partitions on
        its own chip — on a 4-chip host the count phase now runs 4
        partitions concurrently instead of idling 3/4 of the machine),
        reading EVERY host's bucket files for each (dist/spill.py
        read_chunk_all over the shared dir).  The global
        histogram/totals allgather-sum at the end; the result carries
        THIS host's partitions — the per-host partition outputs the
        multihost driver persists (scripts/multihost_count.py)."""
        import threading
        import time as _time

        from jax.experimental import multihost_utils

        plan, WK = self.plan, self.WK
        cap, P_ = plan.table_cap, self.spill_partitions
        Rc = self.spill_chunk_rows
        rank = jax.process_index()
        n_hosts = jax.process_count()
        t0 = _time.perf_counter()

        if not hasattr(self, "_spill_local_prog"):
            from dsk_tpu.kmer.device import sum_by_key_planes_capped

            cs = self._spill_merge_segments

            def merge_local(rec_p, rec_c, tab_p, tab_c, tover):
                planes = tuple(
                    jnp.concatenate([rec_p[w], tab_p[w]])
                    for w in range(WK)
                )
                weights = jnp.concatenate([rec_c, tab_c])
                uniq, counts, n_uniq, n_lost, wrapped = (
                    sum_by_key_planes_capped(
                        planes, weights, cap, segments=cs
                    )
                )
                tover = tover + (
                    ((n_uniq > cap) | (n_lost > 0)).astype(jnp.int32)
                    + (wrapped << WRAP_SHIFT)
                )[None]
                return jnp.stack(uniq, axis=0), counts, tover

            self._spill_local_prog = jax.jit(
                merge_local, donate_argnums=(2, 3, 4)
            )

            # tables must init ON the worker's chip: jit places the
            # computation on its committed argument's device, so a tiny
            # committed token pins the (otherwise constant) fills there
            def init_on(tok):
                return (
                    jnp.full((WK, cap), SENTINEL, jnp.uint32),
                    jnp.zeros((cap,), jnp.int32),
                    jnp.zeros((1,), jnp.int32) + tok * 0,
                )

            self._spill_local_init = jax.jit(init_on)

        hist = np.zeros(self.nb_bins + 1, np.int64)
        collect = pass_sink is None
        out_k: list = []
        out_c: list = []
        out_b: list = []
        sizes: list[int] = []
        ids: list[int] = []
        splits = 0
        n_distinct = 0
        work = [
            (pid, P_, pid)
            for pid in range(P_)
            if pid % n_hosts == rank and spill.rows_all(pid) > 0
        ]
        local_devs = [
            d for d in self.mesh.devices.flat
            if d.process_index == rank
        ]
        # shared mutable state under one condition variable: the work
        # deque (splits append), the rank-strided split-id counter, the
        # emit accumulators (hist/out/ids/sizes — the sink is called
        # under the lock too: HDF5 appends are not thread-safe), and the
        # in-flight count that drives termination
        cond = threading.Condition()
        state = {
            "next_id": P_ + rank,  # rank-strided: globally unique ids
            "in_flight": 0,
            "splits": 0,
            "n_distinct": 0,
            "errors": [],
            "devices_used": set(),
        }

        def worker(dev):
            from concurrent.futures import ThreadPoolExecutor

            tok = jax.device_put(np.int32(0), dev)
            with ThreadPoolExecutor(1) as loader:
                worker_loop(dev, tok, loader)

        def worker_loop(dev, tok, loader):
            while True:
                with cond:
                    if state["errors"]:
                        return  # fail fast: a peer worker died
                    while not work and state["in_flight"]:
                        cond.wait()
                    if state["errors"] or (
                        not work and not state["in_flight"]
                    ):
                        return
                    item = work.pop(0)
                    state["in_flight"] += 1
                try:
                    pid, modulus, residue = item
                    tab_p, tab_c, tover = self._spill_local_init(tok)
                    total_rows = spill.rows_all(pid)
                    n_chunks = max(-(-total_rows // Rc), 1)

                    def load(ci, _pid=pid):
                        chunk = spill.read_chunk_all(_pid, ci * Rc, Rc)
                        rec_p = np.full((WK, Rc), SENTINEL, np.uint32)
                        rec_c = np.zeros((Rc,), np.int32)
                        r = chunk.shape[0]
                        if r:
                            rec_p[:, :r] = chunk[:, :WK].T
                            rec_c[:r] = chunk[:, WK].view(np.int32)
                        return rec_p, rec_c

                    # 1-ahead loader: the shared-FS read + host assembly
                    # of chunk ci+1 overlaps chunk ci's device merge
                    # (the single-process path's putter, per worker)
                    fut = loader.submit(load, 0)
                    for ci in range(n_chunks):
                        rec_p, rec_c = fut.result()
                        if ci + 1 < n_chunks:
                            fut = loader.submit(load, ci + 1)
                        tab_p, tab_c, tover = self._spill_local_prog(
                            jax.device_put(rec_p, dev),
                            jax.device_put(rec_c, dev),
                            tab_p, tab_c, tover,
                        )
                    if int(np.asarray(tover)[0]):
                        if modulus >= (1 << 24):
                            raise TableOverflow(
                                f"spill partition {pid} cannot fit "
                                f"{cap}-slot tables even after "
                                f"{modulus // P_}x splitting"
                            )
                        with cond:
                            nid = state["next_id"]
                            state["next_id"] += n_hosts
                            if ckpt is not None:
                                # fill-only resume: the split is about
                                # to rewrite bucket files in place, so
                                # THIS host's fill manifest must die
                                # FIRST — a post-split crash must never
                                # skip the fill over mutated buckets
                                # whose children the fresh work list
                                # would not enumerate (silent loss)
                                ckpt.clear_pass(pass_id, host=rank)
                        # file rewrite outside the lock: this worker
                        # holds pid exclusively (fill is complete, no
                        # other worker owns it)
                        spill.split(pid, modulus, residue, nid)
                        with cond:
                            work.append((pid, 2 * modulus, residue))
                            work.append(
                                (nid, 2 * modulus, residue + modulus)
                            )
                            state["splits"] += 1
                            state["in_flight"] -= 1
                            cond.notify_all()
                        continue
                    tc = np.asarray(tab_c)
                    tp = np.asarray(tab_p)
                    mask = tc > 0
                    # O(rows) grouping/bincount OUTSIDE the lock: only
                    # the sink call + shared accumulators serialize
                    prep = self._spill_prepare_partition(
                        tp[:, mask].T, tc[mask], nb_banks
                    )
                    with cond:
                        n_p = self._spill_emit_prepared(
                            pass_id, pid, prep, pass_sink, hist,
                            out_k, out_c, out_b,
                        )
                        state["n_distinct"] += n_p
                        ids.append(pid)
                        sizes.append(n_p)
                        state["devices_used"].add(dev.id)
                        state["in_flight"] -= 1
                        cond.notify_all()
                except BaseException as e:  # noqa: BLE001 — re-raised below
                    with cond:
                        state["errors"].append(e)
                        state["in_flight"] -= 1
                        cond.notify_all()
                    return

        # one worker per local chip even when the INITIAL queue is
        # smaller: splits can fan a single skewed partition out into
        # more children than there were initial work items, and idle
        # workers wake on the queue's condition variable
        threads = [
            threading.Thread(target=worker, args=(d,), daemon=True)
            for d in local_devs
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if state["errors"]:
            raise state["errors"][0]
        splits = state["splits"]
        n_distinct = state["n_distinct"]
        # global histogram/totals (identical on every host)
        hist = np.asarray(
            multihost_utils.process_allgather(hist)
        ).sum(axis=0)
        tot = np.asarray(
            multihost_utils.process_allgather(
                np.array(
                    [n_distinct, stats.get("n_bases", 0),
                     stats.get("n_reads", 0)],
                    np.int64,
                )
            )
        )
        self.local_partition_ids = ids
        info = dict(stats)
        info.update(
            {
                "nb_banks": nb_banks,
                "n_chips": plan.n,
                "n_hosts": n_hosts,
                "n_bases_local": stats.get("n_bases", 0),
                "n_bases": int(tot[:, 1].sum()),
                "n_reads": int(tot[:, 2].sum()),
                "spill": True,
                "spill_partitions": P_,
                "spill_splits": splits,
                "partition_sizes": sizes,
                "partition_ids": ids,
                # distinct local chips that merged >= 1 partition (the
                # chip-parallel count-phase evidence, VERDICT r4 weak #2)
                "spill_count_devices": len(state["devices_used"]),
                "n_distinct_device": int(tot[:, 0].sum()),
                "t_count_phase": round(_time.perf_counter() - t0, 3),
            }
        )
        kmers, counts, bank_counts = self._spill_collect_result(
            collect, out_k, out_c, out_b, nb_banks
        )
        return CountResult(
            k=self.k, kmers=kmers, counts=counts, histogram=hist,
            bank_counts=bank_counts, info=info,
        )

    def _count_partitions(
        self, spill, pass_id: int, pass_sink, stats: dict,
        nb_banks: int = 1, ckpt=None, ckpt_fill_only: bool = False,
    ) -> CountResult:
        """Count phase: merge each partition's spilled records into an
        HBM table, n partitions at a time (chip j owns batch[j]).  A
        partition that overflows its table (or wraps the occurrence
        cumsum) is SPLIT locally (hash modulus doubling) and requeued —
        only that bucket's bytes are re-read, never the input.

        ckpt (dist/spill.py SpillCheckpoint): a durable mark is written
        after every counted batch (remaining work queue + split state +
        running histogram + caller extras), so a crashed run resumes
        from the last mark instead of recounting the pass.
        ckpt_fill_only: no marks — the ckpt is used ONLY to invalidate
        this pass's fill manifest before a split mutates the bucket
        files (the fill-resume safety rule)."""
        if self.multi_process:
            return self._count_partitions_multiproc(
                spill, pass_id, pass_sink, stats, nb_banks, ckpt=ckpt
            )
        marks = ckpt if not ckpt_fill_only else None
        import time as _time

        plan, WK = self.plan, self.WK
        n, cap, P_ = plan.n, plan.table_cap, self.spill_partitions
        Rc = self.spill_chunk_rows
        sh_p = NamedSharding(self.mesh, P(None, AXIS))
        sh_b = NamedSharding(self.mesh, P(AXIS))
        device0 = self.mesh.devices.flat[0]
        single = n == 1
        t0 = _time.perf_counter()
        hist = np.zeros(self.nb_bins + 1, np.int64)
        collect = pass_sink is None
        out_k: list = []
        out_c: list = []
        out_b: list = []
        sizes: dict[int, int] = {}
        next_id = P_
        n_distinct = 0
        splits = 0
        resumed = False
        # (store partition id, hash modulus, residue)
        work = [(pid, P_, pid) for pid in spill.partitions()]
        if marks is not None:
            state = marks.load_count(pass_id)
            if state is not None:
                # resume from the last durable mark: already-counted
                # partitions are absent from the restored work queue
                # (their rows are in the caller's store — run.py
                # truncates it to the mark's recorded sizes)
                work = list(state["work"])
                next_id = state["next_id"]
                splits = state["splits"]
                n_distinct = state["n_distinct"]
                sizes = dict(state["sizes"])
                hist[:] = state["hist"]
                sp = state.get("splitting")
                if sp is not None:
                    # the crash hit between the split-INTENT mark and
                    # its completion mark: redo the split (idempotent
                    # at every crash point — SpillStore.split) and
                    # enqueue the children the intent recorded
                    pid0, m0, r0, nid0 = sp
                    spill.split(pid0, m0, r0, nid0)
                    work = work + [
                        (pid0, 2 * m0, r0),
                        (nid0, 2 * m0, r0 + m0),
                    ]
                resumed = True
        from concurrent.futures import ThreadPoolExecutor

        # sliced parallel puts (single-chip only): one monolithic ~100 MB
        # device_put rides ONE tunnel stream (~9 MB/s); T column slices
        # over a put pool multiplex to ~22 MB/s (measure_h2d_streams),
        # reassembled by a tiny jitted device-side concat.  Sharded
        # meshes keep the single sharded put (slice-puts would fight the
        # sharding layout).
        T_put = _D2H_STREAMS if single else 1
        if single and not hasattr(self, "_spill_cat"):
            step = -(-Rc * n // T_put)

            def cat(ps, cs):
                return (
                    jnp.concatenate(ps, axis=1),
                    jnp.concatenate(cs, axis=0),
                )

            self._spill_cat = jax.jit(cat)
            self._spill_cat_step = step

        def make_chunk(batch, ci):
            """Assemble + transfer one merge chunk (runs one ahead on
            the putter thread so host read/assembly and the H2D wire
            overlap the previous chunk's device merge; the 1-element
            fetches are the eager-wire fence — device_put is lazy
            through the tunnel, see _feed_groups)."""
            rec_p = np.full((WK, n * Rc), SENTINEL, np.uint32)
            rec_c = np.zeros((n * Rc,), np.int32)
            for j, e in enumerate(batch):
                chunk = spill.read_chunk(e[0], ci * Rc, Rc)
                r = chunk.shape[0]
                if r:
                    rec_p[:, j * Rc : j * Rc + r] = chunk[:, :WK].T
                    rec_c[j * Rc : j * Rc + r] = chunk[:, WK].view(
                        np.int32
                    )
            if not single:
                rp_dev = jax.device_put(rec_p, sh_p)
                rc_dev = jax.device_put(rec_c, sh_b)
                _ = np.asarray(rp_dev[0, 0])
                return rp_dev, rc_dev
            step = self._spill_cat_step

            def put_slice(i):
                lo = i * step
                hi = min(lo + step, n * Rc)
                p = jax.device_put(
                    np.ascontiguousarray(rec_p[:, lo:hi]), device0
                )
                c = jax.device_put(rec_c[lo:hi], device0)
                _ = np.asarray(p[0, :1])
                return p, c

            import contextlib

            wire_lock = getattr(self, "_wire_lock", None) or (
                contextlib.nullcontext()
            )
            with wire_lock:
                with ThreadPoolExecutor(T_put) as ex:
                    parts = list(ex.map(put_slice, range(T_put)))
            return self._spill_cat(
                [p for p, _c in parts], [c for _p, c in parts]
            )

        putter = ThreadPoolExecutor(1)
        try:
          while work:
            batch, work = work[:n], work[n:]
            tab_p, tab_c, _over, tover = self._init_state()
            max_rows = max(spill.rows(e[0]) for e in batch)
            n_chunks = max(-(-max_rows // Rc), 1)
            fut = putter.submit(make_chunk, batch, 0)
            for ci in range(n_chunks):
                rp_dev, rc_dev = fut.result()
                if ci + 1 < n_chunks:
                    fut = putter.submit(make_chunk, batch, ci + 1)
                tab_p, tab_c, tover = self._spill_merge(
                    rp_dev, rc_dev, tab_p, tab_c, tover
                )
            flags = np.asarray(tover)
            parts = {
                p: (kk, cc)
                for p, kk, cc in self.iter_partitions(tab_p, tab_c)
            }
            def mark_state(rest, splitting=None):
                """Durable progress snapshot: remaining work = the
                batch's unprocessed tail + the queue.  A crash replays
                from the last mark — run.py truncates the store to the
                mark's recorded sizes, so replays never duplicate
                rows."""
                return {
                    "work": list(rest) + work,
                    "next_id": next_id,
                    "splits": splits,
                    "n_distinct": n_distinct,
                    "sizes": sizes,
                    "hist": hist,
                    "splitting": splitting,
                }

            for j, e in enumerate(batch):
                pid, modulus, residue = e
                rest = batch[j + 1:]
                if flags[j]:
                    if modulus >= (1 << 24):
                        raise TableOverflow(
                            f"spill partition {pid} cannot fit "
                            f"{cap}-slot tables even after "
                            f"{modulus // P_}x splitting"
                        )
                    nid = next_id
                    next_id += 1
                    splits += 1
                    if ckpt is not None and marks is None:
                        # fill-only resume: the manifest must die BEFORE
                        # the split mutates the bucket files — a
                        # post-split crash must never skip the fill over
                        # buckets whose children a fresh work list would
                        # not enumerate (silent loss); the mark protocol
                        # below handles this for full mid-pass resume
                        ckpt.clear_pass(pass_id)
                    if marks is not None:
                        # INTENT mark before the files move: a crash
                        # mid-split resumes by REDOING the (idempotent)
                        # split — without it the half-moved parent would
                        # merge clean and orphan the hi-side child
                        marks.mark(
                            pass_id,
                            mark_state(
                                rest,
                                splitting=(pid, modulus, residue, nid),
                            ),
                        )
                    spill.split(pid, modulus, residue, nid)
                    work.append((pid, 2 * modulus, residue))
                    work.append((nid, 2 * modulus, residue + modulus))
                    if marks is not None:
                        marks.mark(pass_id, mark_state(rest))
                    continue
                kk, cc = parts.get(j, (None, None))
                if kk is None or kk.shape[0] == 0:
                    sizes[pid] = 0
                    if marks is not None:
                        marks.mark(pass_id, mark_state(rest))
                    continue
                n_p = self._spill_emit_partition(
                    pass_id, pid, kk, cc, pass_sink, hist,
                    out_k, out_c, out_b, nb_banks,
                )
                n_distinct += n_p
                sizes[pid] = n_p
                if marks is not None:
                    marks.mark(pass_id, mark_state(rest))
        finally:
            putter.shutdown(wait=True, cancel_futures=True)
        info = dict(stats)
        info.update(
            {
                "nb_banks": nb_banks,
                "n_chips": n,
                "spill": True,
                "spill_partitions": P_,
                "spill_splits": splits,
                "spill_resumed": resumed,
                "partition_sizes": sizes,
                "n_distinct_device": n_distinct,
                "t_count_phase": round(_time.perf_counter() - t0, 3),
            }
        )
        kmers, counts, bank_counts = self._spill_collect_result(
            collect, out_k, out_c, out_b, nb_banks
        )
        return CountResult(
            k=self.k,
            kmers=kmers,
            counts=counts,
            histogram=hist,
            bank_counts=bank_counts,
            info=info,
        )

    def iter_partitions(self, tab_p=None, tab_c=None):
        """Yield (global_partition_id, kmers (n_live, WK), counts) one
        chip at a time — the bounded-memory gather.  Multi-process
        meshes yield only this host's chips (per-host partition
        outputs, the partition-files analog)."""
        if tab_p is None:
            tab_p, tab_c = self._last_state
        WK, plan = self.WK, self.plan
        if plan.n == 1 and not self.multi_process:
            # single chip: live-prefix chunked download (bounded AND
            # tunnel-parallel; see _live_prefix)
            tp, tc = _live_prefix(
                tab_p, tab_c, WK, plan,
                getattr(self, "_live", None), aot=True,
            )
            mask = tc[0] > 0
            yield 0, tp[:, 0][:, mask].T, tc[0][mask]
            return
        cap, S = plan.table_cap, plan.S
        capb = cap // S
        counts_by_chip = {}
        for s in tab_c.addressable_shards:
            counts_by_chip[(s.index[0].start or 0) // cap] = s
        planes_by_chip = {}
        for s in tab_p.addressable_shards:
            planes_by_chip[(s.index[1].start or 0) // cap] = s
        for p in sorted(counts_by_chip):
            tc = np.asarray(counts_by_chip[p].data).reshape(S, capb)
            tp = np.asarray(planes_by_chip[p].data).reshape(WK, S, capb)
            mask = tc > 0
            yield p, tp[:, mask].T, tc[mask]

    def count_stream(
        self, batches, nb_banks: int = 1, pass_id: int = 0,
        finalize: bool = True, progress_cb=None, resume_state=None,
    ) -> CountResult:
        """Count over an iterable of Batch objects (core loop; count() wraps
        it with the bank reader, dryrun/bench feed synthetic batches).

        finalize=False skips the table device->host gather: the result has
        histogram/info but empty kmers/counts, and the device tables are
        left on self._last_state for a later gather (bench uses this to
        time the streaming phase separately from the output download,
        which through the axon tunnel runs at ~9 MB/s vs GB/s on real
        PCIe).

        resume_state: a work-preserving retry snapshot (VERDICT r2 weak
        #2 — the reference never re-reads counted partitions,
        doc/paper.tex:71-76): {"state": (tab_p, tab_c, over, tover)}
        device tables to start from instead of a fresh init.  Callers
        (engine.count's retry path) pair it with skipping the batches
        already consumed at snapshot time."""
        k, W, plan = self.k, self.W, self.plan

        resumed_groups = 0
        if resume_state is not None:
            tab_p, tab_c, over, tover = resume_state["state"]
            resumed_groups = resume_state["groups"]
            n_bases = resume_state["n_bases"]
            n_reads = resume_state["n_reads"]
        else:
            tab_p, tab_c, over, tover = self._init_state()
            n_bases = 0
            n_reads = 0
        G = plan.buf_batches

        # work-preserving retry snapshots (VERDICT r2 weak #2): each
        # passing periodic overflow check copies the device tables (the
        # step donates its table buffers, so a snapshot must be a fresh
        # buffer — `x + 0` under jit; an HBM copy of <= table bytes,
        # ~ms).  When a later check raises, the last good snapshot rides
        # self._retry_snapshot: the retry valve (engine/run.py) restarts
        # the stream from it, skipping the already-counted groups'
        # pack/wire/device work (host re-parse only — the reader order
        # is deterministic, io/batch.py parallel_batch_iterator).  The
        # reference analog: counted partitions persist on disk and are
        # never re-read (doc/paper.tex:71-76).
        if not hasattr(self, "_snap_copy"):
            self._snap_copy = jax.jit(
                lambda a, b, c, d: (a + 0, b + 0, c + 0, d + 0)
            )
        snap = None
        self._retry_snapshot = None

        def take_snapshot():
            return {
                "state": self._snap_copy(tab_p, tab_c, over, tover),
                "groups": resumed_groups + n_groups,
                "n_bases": n_bases,
                "n_reads": n_reads,
                "pass_id": pass_id,
            }

        if self.multi_process:
            # SPMD contract: every process must dispatch the same number of
            # collective steps; exhausted hosts pad with empty batches
            from dsk_tpu.dist.multihost import lockstep_batches
            from dsk_tpu.io.batch import PAD, Batch

            rows = self.local_batch_rows

            def make_empty():
                return Batch(
                    np.full((rows, self.row_len), PAD, np.uint8),
                    np.zeros(rows, np.int32),
                    0,
                )

            batches = lockstep_batches(batches, make_empty, group=G)

        import time as _time

        # sub-phase attribution (cheap perf_counter pairs): t_gen is the
        # reader+stack time and t_put the H2D time, both ON the prefetch
        # thread; t_feed is how long the dispatch loop WAITED for them;
        # t_drain is the final sync where all queued device work lands.
        # Overlap means t_feed << t_gen+t_put when the device is the
        # bottleneck, and t_drain ~ 0 when the host is.
        sub = {"t_gen": 0.0, "t_put": 0.0, "t_feed": 0.0, "t_drain": 0.0}
        wire_bytes = [0]  # H2D payload accounting (window-health diag)
        t0 = _time.perf_counter()
        n_groups = 0
        feed = self._feed_groups(batches, sub, wire_bytes)
        from dsk_tpu.io.packed import WireOverflow

        while True:
            f0 = _time.perf_counter()
            try:
                item = next(feed, None)
            except WireOverflow:
                # raised by the exc packer on a put thread (N-dense
                # row): device tables are valid through the last
                # dispatched group, so attach the snapshot — the valve
                # (engine/run.py) rebuilds with wire="bitmap" and
                # resumes rather than recounting from zero
                self._retry_snapshot = snap
                raise
            sub["t_feed"] += _time.perf_counter() - f0
            if item is None:
                break
            words_dev, bitmap_dev, bids_dev, bb, rr = item
            n_bases += bb
            n_reads += rr
            tab_p, tab_c, over, tover = self._step(
                words_dev, bitmap_dev, bids_dev, tab_p, tab_c, over,
                tover, jnp.int32(pass_id),
            )
            n_groups += 1
            if progress_cb is not None and n_groups % 8 == 0:
                progress_cb(
                    (resumed_groups + n_groups) * G, n_bases, n_reads
                )
            # fail fast every few groups: an overflowing long run must not
            # stream to completion before erroring (each check is a host
            # sync, so amortize it).  A passing check refreshes the retry
            # snapshot; a failing one attaches the last good snapshot to
            # the raised overflow's engine so the valve can resume.
            if n_groups % 8 == 0:
                try:
                    self._check_overflow(over, tover)
                except (RoutingOverflow, TableOverflow):
                    self._retry_snapshot = snap
                    raise
                snap = take_snapshot()
        return self._finish_stream(
            tab_p, tab_c, over, tover, snap, n_bases, n_reads, nb_banks,
            resumed_groups, sub, wire_bytes, t0, finalize,
        )

    def _feed_groups(self, batches, sub, wire_bytes):
        """The host feed pipeline, shared by the table stream
        (count_stream) and the spill stream (_spill_stream): pack each
        batch to the packed wire format, transfer over parallel put
        streams, and yield ONE DEVICE GROUP per flush group as
        (words_dev, bitmap_dev, bids_dev, n_bases, n_reads).

        Single-device engines transfer per BATCH (16 parallel put
        streams, packed on the pool threads) and stack G batches into a
        group with a tiny jitted device-side stack; sharded /
        multi-process engines pack+stack on the host and transfer whole
        groups.  A WireOverflow from the exc packer propagates to the
        consumer's next()."""
        import time as _time

        plan = self.plan
        G = plan.buf_batches
        group_sharding = NamedSharding(self.mesh, P(None, AXIS, None))
        bid_sharding = NamedSharding(self.mesh, P(None, AXIS))
        single = plan.n == 1
        device0 = self.mesh.devices.flat[0]
        local_rows = (
            self.local_batch_rows if self.multi_process else self.batch_rows
        )

        from dsk_tpu.io.packed import (
            pack_codes,
            pack_codes_exc,
            packed_shapes,
        )

        nw_p, nb_p = packed_shapes(self.row_len)
        exc_wire = self.wire == "exc"
        wire_E = self.wire_E
        import contextlib

        wire_lock = getattr(self, "_wire_lock", None) or (
            contextlib.nullcontext()
        )

        def pack_one(batch):
            """Pack one batch to the packed wire format (io/packed.py)
            on the prefetch thread: the host->device link is the narrow
            resource (the axon tunnel moves byte codes at ~7-10 MB/s
            sustained, measured round 2), so wire bytes are cut 2.67x
            (bitmap) / 3.5x (exc, the default) before the transfer,
            overlapped with device compute."""
            codes = np.ascontiguousarray(batch.codes, np.uint8)
            if exc_wire:
                words, bitmap = pack_codes_exc(codes, wire_E)
            else:
                words, bitmap = pack_codes(codes)
            bids = np.ascontiguousarray(batch.bank_ids, np.int32)
            return words, bitmap, bids, batch.n_bases, batch.n_reads

        def pad_items(cnt):
            pad_w = np.zeros((local_rows, nw_p), np.uint32)
            if exc_wire:  # live 0 = dead row; exception slots unused
                pad_m = np.zeros((local_rows, 1 + wire_E), np.uint16)
            else:
                pad_m = np.zeros((local_rows, nb_p), np.uint32)
            pad_b = np.zeros(local_rows, np.int32)
            while cnt % G:
                yield (pad_w, pad_m, pad_b, 0, 0)
                cnt += 1

        def items(src):
            """Per-BATCH packed items, tail padded to a whole group.
            Per-batch wire granularity lets the H2D stream overlap device
            compute at batch grain — with group-sized puts the FIRST
            group's whole wire serializes ahead of any compute."""
            cnt = 0
            for batch in src:
                yield pack_one(batch)
                cnt += 1
            yield from pad_items(cnt)

        def raw_items(src):
            """Per-BATCH items for the single-device wire path: raw
            batches pass through unpacked and are packed ON the put pool
            threads (the C packer releases the GIL), so the wire pack
            parallelizes instead of serializing behind the reader on the
            gen thread — the host pipeline's measured serial tail
            (PERF.md, measure_host_pipeline.py: 105 Mbases/s plateau at
            4 workers).  Pad items are pre-packed tuples."""
            cnt = 0
            for batch in src:
                yield batch
                cnt += 1
            yield from pad_items(cnt)

        def groups(src):
            """Pack + stack G batches into one packed group (tail padded);
            the sharded / multi-process wire path."""
            cur, bb, rr = [], 0, 0
            for it in items(src):
                cur.append(it)
                bb += it[3]
                rr += it[4]
                if len(cur) == G:
                    yield (np.stack([c[0] for c in cur]),
                           np.stack([c[1] for c in cur]),
                           np.stack([c[2] for c in cur]), bb, rr, G)
                    cur, bb, rr = [], 0, 0

        # host->device transfers happen on a background thread so they
        # overlap device compute (double-buffered; P5 pipeline overlap)
        from dsk_tpu.io.prefetch import prefetch

        def put(group):
            words, bitmap, bids, bb, rr, cnt = group
            wire_bytes[0] += words.nbytes + bitmap.nbytes + bids.nbytes
            if self.multi_process:
                # this host's rows feed its own chips; the global group is
                # assembled across processes without replication
                return (
                    jax.make_array_from_process_local_data(
                        group_sharding, words,
                        (G, self.batch_rows, words.shape[2]),
                    ),
                    jax.make_array_from_process_local_data(
                        group_sharding, bitmap,
                        (G, self.batch_rows, bitmap.shape[2]),
                    ),
                    jax.make_array_from_process_local_data(
                        bid_sharding, bids, (G, self.batch_rows)
                    ),
                    bb,
                    rr,
                )
            where = device0 if single else group_sharding
            where_b = device0 if single else bid_sharding
            with wire_lock:
                words_dev = jax.device_put(words, where)
                bitmap_dev = jax.device_put(bitmap, where)
                bids_dev = jax.device_put(bids, where_b)
                _ = np.asarray(words_dev[0, 0, 0])
            return (words_dev, bitmap_dev, bids_dev, bb, rr)
            # eager-wire fence: device_put only DISPATCHES the transfer;
            # through the axon tunnel the bytes are otherwise pulled
            # lazily when the step that consumes them executes, which
            # serializes wire time behind host gen time instead of
            # overlapping them (measured: stream ~= t_gen + wire).  A
            # 1-element fetch here (on the prefetch thread) forces the
            # transfer to stream NOW, while the next group is being
            # parsed and earlier steps execute.  (wire_lock: see
            # __init__ — spill mode serializes tunnel directions.)

        # single-device engines transfer per BATCH, not per group: the
        # step still consumes (G, ...) stacked arrays, but a tiny jitted
        # device-side stack assembles them from G per-batch transfers, so
        # the wire streams at batch grain and overlaps compute from the
        # very first batch (a group-sized put serializes the whole first
        # group's wire ahead of any compute)
        per_batch_wire = single and not self.multi_process

        def timed_gen():
            it = raw_items(batches) if per_batch_wire else groups(batches)
            while True:
                g0 = _time.perf_counter()
                nxt = next(it, None)
                sub["t_gen"] += _time.perf_counter() - g0
                if nxt is None:
                    return
                yield nxt

        def put_item(it):
            if not isinstance(it, tuple):  # raw Batch: pack on this pool
                it = pack_one(it)
            words, bitmap, bids, bb, rr = it
            wire_bytes[0] += words.nbytes + bitmap.nbytes + bids.nbytes
            with wire_lock:
                words_dev = jax.device_put(words, device0)
                bitmap_dev = jax.device_put(bitmap, device0)
                bids_dev = jax.device_put(bids, device0)
                _ = np.asarray(words_dev[0, 0])  # eager fence (see put)
            return (words_dev, bitmap_dev, bids_dev, bb, rr)

        def timed_put(nxt):
            # pack/stack (timed_gen, own prefetch thread) overlaps the
            # wire (put + eager fence, pool threads): with the fence the
            # transfer completes inside put(), so without the extra
            # stage host gen time and wire time would serialize.
            # t_put is summed ACROSS put threads (can exceed wall).
            g1 = _time.perf_counter()
            out = put_item(nxt) if per_batch_wire else put(nxt)
            sub["t_put"] += _time.perf_counter() - g1
            return out

        # the tunnel (like a real NIC) multiplexes parallel H2D streams:
        # measured 9 MB/s on one stream -> 22-24 MB/s with 8 concurrent
        # puts (scripts/measure_h2d_streams.py).  Groups transfer on a
        # small thread pool, consumed in order.
        import os as _os

        # default 16: the tunnel (and real NICs) multiplex parallel puts —
        # measured 9 MB/s at 1 stream, 22-24 at 16, regression at 32
        # (scripts/measure_h2d_streams.py); per-batch items are small so
        # 16 threads stay fed.  Harmless on PCIe metal.
        put_streams = int(_os.environ.get("DSK_TPU_PUT_STREAMS", "16"))
        from dsk_tpu.io.prefetch import parallel_map

        depth = max(2, put_streams) * (G if per_batch_wire else 1)
        feed = iter(
            parallel_map(
                timed_put,
                prefetch(timed_gen(), depth=depth),
                workers=put_streams,
                inflight=put_streams + (G if per_batch_wire else 1),
            )
        )
        if per_batch_wire and not hasattr(self, "_stack_group"):
            self._stack_group = jax.jit(
                lambda ws, ms, bs: (
                    jnp.stack(ws), jnp.stack(ms), jnp.stack(bs)
                ),
                donate_argnums=(0, 1, 2),
            )

        pend: list = []
        bb_acc = rr_acc = 0
        for item in feed:
            if per_batch_wire:
                pend.append(item)
                bb_acc += item[3]
                rr_acc += item[4]
                if len(pend) < G:
                    continue
                words_dev, bitmap_dev, bids_dev = self._stack_group(
                    [p[0] for p in pend],
                    [p[1] for p in pend],
                    [p[2] for p in pend],
                )
                pend = []
                yield (words_dev, bitmap_dev, bids_dev, bb_acc, rr_acc)
                bb_acc = rr_acc = 0
            else:
                yield item

    def _finish_stream(
        self, tab_p, tab_c, over, tover, snap, n_bases, n_reads,
        nb_banks, resumed_groups, sub, wire_bytes, t0, finalize,
    ) -> CountResult:
        """Drain + finalize a table stream: final overflow check,
        histogram, and (unless finalize=False) the table gather."""
        import time as _time

        k, W, plan = self.k, self.W, self.plan
        d0 = _time.perf_counter()
        try:
            self._check_overflow(over, tover)  # final host sync: drained
        except (RoutingOverflow, TableOverflow):
            self._retry_snapshot = snap
            raise
        sub["t_drain"] = _time.perf_counter() - d0

        info = {
            "n_bases": n_bases,
            "n_reads": n_reads,
            "nb_banks": nb_banks,
            "n_chips": plan.n,
            # groups NOT re-streamed because a retry resumed from a
            # snapshot (work preserved across the overflow)
            "resumed_groups": resumed_groups,
            "t_stream": round(_time.perf_counter() - t0, 3),
            "t_sub": {k: round(v, 3) for k, v in sub.items()},
            # implied H2D rate over the whole stream: << 20 MB/s through
            # the axon tunnel means the run measured a degraded wire
            # window, not the pipeline (PERF.md weather protocol)
            "wire_mb": round(wire_bytes[0] / (1 << 20), 1),
            "wire_mb_per_s": round(
                wire_bytes[0]
                / (1 << 20)
                / max(_time.perf_counter() - t0, 1e-9),
                1,
            ),
        }
        if self.multi_process:
            from jax.experimental import multihost_utils

            tot = np.asarray(
                multihost_utils.process_allgather(
                    np.array([n_bases, n_reads], np.int64)
                )
            )
            info["n_bases_local"] = n_bases
            info["n_bases"] = int(tot[:, 0].sum())
            info["n_reads"] = int(tot[:, 1].sum())
            info["n_hosts"] = jax.process_count()

        if not self.per_bank:
            # histogram is psum-merged on device: identical on every host
            th = _time.perf_counter()
            hist = np.zeros(self.nb_bins + 1, np.int64)
            hist += np.asarray(self._hist(tab_c), dtype=np.int64)
            info["t_hist"] = round(_time.perf_counter() - th, 3)
            if not finalize:
                self._last_state = (tab_p, tab_c)
                info["n_distinct_device"] = int(hist[1:].sum())
                return CountResult(
                    k=k,
                    kmers=np.empty((0, W), np.uint32),
                    counts=np.empty((0,), np.int32),
                    histogram=hist,
                    info=info,
                )
            tg = _time.perf_counter()
            kmers, counts, sizes = self.gather_tables(tab_p, tab_c)
            info["t_gather"] = round(_time.perf_counter() - tg, 3)
            info["partition_sizes"] = sizes
            return CountResult(
                k=k, kmers=kmers, counts=counts, histogram=hist, info=info
            )

        # per-bank finalize: gather (kmer, bank) rows, group per kmer on
        # host (the device hist counts pairs, so histogram is host-built
        # from the grouped totals)
        if not finalize:
            # bounded per-bank emit path: tables stay on device for
            # _emit_pass_per_bank (which also builds the histogram)
            self._last_state = (tab_p, tab_c)
            return CountResult(
                k=k,
                kmers=np.empty((0, self.WK), np.uint32),
                counts=np.empty((0,), np.int32),
                histogram=np.zeros(self.nb_bins + 1, np.int64),
                info=info,
            )
        kmers, counts, bank_mat, sizes = self.gather_tables_per_bank(
            tab_p, tab_c, nb_banks
        )
        from dsk_tpu.engine import processors

        hist = processors.histogram(counts, self.nb_bins)
        info["partition_sizes"] = sizes
        return CountResult(
            k=k,
            kmers=kmers,
            counts=counts.astype(np.int32),
            histogram=hist,
            bank_counts=bank_mat,
            info=info,
        )

    def _host_sum(self, arr) -> int:
        """Sum of a (n,)-sharded int array, multi-process safe (local
        shards + a process allgather)."""
        if not self.multi_process:
            return int(np.asarray(arr).sum())
        local = sum(
            int(np.asarray(s.data).sum()) for s in arr.addressable_shards
        )
        from jax.experimental import multihost_utils

        return int(
            np.asarray(
                multihost_utils.process_allgather(
                    np.array([local], np.int64)
                )
            ).sum()
        )

    def _check_overflow(self, over, tover) -> None:
        plan = self.plan
        n_over = self._host_sum(over)
        if n_over:
            raise RoutingOverflow(
                f"routing overflow: {n_over} kmers exceeded the "
                f"per-destination capacity {plan.send_cap} "
                f"(send_slack too low for this skew)"
            )
        t = self._host_sum(tover)
        if t >> WRAP_SHIFT:
            raise CountVolumeOverflow(
                f"occurrence-volume overflow: a chip accumulated more "
                f"than 2^31 k-mer occurrences in one pass (int32 flush "
                f"cumsum wrapped {t >> WRAP_SHIFT} time(s)); more "
                f"passes needed"
            )
        if t & ((1 << WRAP_SHIFT) - 1):
            raise TableOverflow(
                f"table overflow: >{plan.table_cap} distinct kmers on a "
                f"chip (distinct-kmer estimate too low)"
            )

    def gather_tables(self, tab_p=None, tab_c=None):
        """Device tables -> host (kmers (n,W), counts, partition sizes).

        Partition p of the output store = chip p's table (the analog of
        dsk/solid/<i>).  On a multi-process mesh only this host's chips
        are gathered (their global indices land in
        self.local_partition_ids) — the partition-files analog: each host
        owns its shard of the output."""
        if tab_p is None:
            tab_p, tab_c = self._last_state
        W, plan = self.W, self.plan
        if self.multi_process:
            return self._gather_tables_local(tab_p, tab_c, W)
        # AOT-cached helpers only on single-chip engines: AOT avals carry
        # no sharding, so the cached executables reject sharded arrays
        single = plan.n == 1
        tp, tc = _live_prefix(
            tab_p, tab_c, W, plan,
            getattr(self, "_live", None) if single else None,
            aot=single,
        )
        parts_w, parts_c, sizes = [], [], []
        for p in range(plan.n):
            mask = tc[p] > 0                     # (S, m)
            parts_w.append(tp[:, p][:, mask].T)  # (n_live, W), bucket-major
            parts_c.append(tc[p][mask])
            sizes.append(int(mask.sum()))
        kmers = np.concatenate(parts_w, axis=0)
        counts = np.concatenate(parts_c, axis=0)
        return kmers, counts, sizes

    def _gather_tables_local(self, tab_p, tab_c, WK: int):
        """Multi-process gather: download only this host's addressable
        table shards.  Sets self.local_partition_ids to the global chip
        indices of the returned partitions."""
        cap = self.plan.table_cap
        counts_by_chip = {}
        for s in tab_c.addressable_shards:
            off = s.index[0].start or 0
            counts_by_chip[off // cap] = np.asarray(s.data)
        planes_by_chip = {}
        for s in tab_p.addressable_shards:
            off = s.index[1].start or 0
            planes_by_chip[off // cap] = np.asarray(s.data)
        S = self.plan.S
        capb = cap // S
        parts_w, parts_c, sizes, ids = [], [], [], []
        for p in sorted(counts_by_chip):
            tc = counts_by_chip[p].reshape(S, capb)
            tp = planes_by_chip[p].reshape(WK, S, capb)
            mask = tc > 0
            parts_w.append(tp[:, mask].T)  # (n_live, WK), bucket-major
            parts_c.append(tc[mask])
            sizes.append(int(mask.sum()))
            ids.append(p)
        self.local_partition_ids = ids
        kmers = (
            np.concatenate(parts_w, axis=0)
            if parts_w else np.empty((0, WK), np.uint32)
        )
        counts = (
            np.concatenate(parts_c, axis=0)
            if parts_c else np.empty((0,), np.int32)
        )
        return kmers, counts, sizes

    def gather_tables_per_bank(self, tab_p, tab_c, nb_banks: int):
        """Per-bank gather: (kmer, bank) rows -> distinct kmers with
        total + per-bank abundances, per chip partition."""
        from dsk_tpu.engine.counter import _group_by_kmer

        W, WK, plan = self.W, self.WK, self.plan
        single = plan.n == 1
        tp, tc = _live_prefix(
            tab_p, tab_c, WK, plan,
            getattr(self, "_live", None) if single else None,
            aot=single,
        )
        parts_k, parts_c, parts_b, sizes = [], [], [], []
        for p in range(plan.n):
            mask = tc[p] > 0                # (S, m)
            # (n_live, WK): bucket-major; within a bucket sorted by
            # (kmer words..., bank) — equal kmers stay adjacent
            rows = tp[:, p][:, mask].T
            kk, cc, bb = _group_by_kmer(rows, tc[p][mask], W, nb_banks)
            parts_k.append(kk)
            parts_c.append(cc)
            parts_b.append(bb)
            sizes.append(int(kk.shape[0]))
        return (
            np.concatenate(parts_k, axis=0),
            np.concatenate(parts_c, axis=0),
            np.concatenate(parts_b, axis=0),
            sizes,
        )


def _spill_debug(msg: str) -> None:
    """stderr spill diagnostics, gated by DSK_TPU_SPILL_DEBUG=1."""
    import os
    import sys
    import time

    if os.environ.get("DSK_TPU_SPILL_DEBUG"):
        print(
            f"[spill {time.strftime('%H:%M:%S')}] {msg}",
            file=sys.stderr, flush=True,
        )


def _locfree():
    """Context: lower without embedding source locations.  Mosaic
    (Pallas) payloads otherwise carry trace-time file:line, so a pure
    line shift in any traced file changes the StableHLO byte-for-byte
    and defeats the persistent cache's content key (measured: one-byte
    payload diffs -> ~3-5 min recompiles after comment-only edits)."""
    from jax._src.config import traceback_in_locations_limit

    return traceback_in_locations_limit(0)


_PCACHE_ENABLED = False


def _enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Point jax's persistent compilation cache at a dsk_tpu directory.

    Verified to cover the axon remote-compile backend (round 2): a 67 s
    step compile restores in ~1 s in a fresh process AND first-executes
    fast — unlike jax.experimental.serialize_executable, whose restored
    executables pay a ~full recompile at first execution (216-244 s
    measured; see DistCountEngine.compile).  Respects an existing
    user-configured cache dir; DSK_TPU_AOT_CACHE=0 disables."""
    import os

    global _PCACHE_ENABLED
    env = os.environ.get("DSK_TPU_AOT_CACHE", "")
    if env == "0":
        return
    if _PCACHE_ENABLED and cache_dir is None:
        return
    current = jax.config.jax_compilation_cache_dir
    if cache_dir is None and current:
        _PCACHE_ENABLED = True
        return  # user already configured one; leave it alone
    cdir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "dsk_tpu", "xla"
    )
    os.makedirs(cdir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cdir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _PCACHE_ENABLED = True


_D2H_STREAMS = 8
_LIVE_PAD = 1 << 16  # live-prefix rounding: bounds chunker recompiles
_SPILL_SLAB_ROWS = 4 << 20  # spill drain slab (48 MB at W=2): big single
                            # fetches stall the tunnel's reverse channel


@functools.lru_cache(maxsize=8)
def _spill_slab_fetcher(WK: int, n: int, Nbuf: int, slab: int, T: int,
                        aot: bool = False):
    """Jitted slab extractor for the spill drain: slice `slab` rows of
    every chip's (WK, n, Nbuf) planes + (n, Nbuf) counts at a RUNTIME
    offset (one compiled program regardless of the live prefix length)
    and emit 2*T flat chunks for parallel D2H streams."""

    def chunk(flat):
        total = flat.shape[0]
        step = -(-total // T)
        return tuple(flat[i * step : (i + 1) * step] for i in range(T))

    @jax.jit
    def prep(tab_p, tab_c, start):
        tp = jax.lax.dynamic_slice(
            tab_p.reshape(WK, n, Nbuf), (0, 0, start), (WK, n, slab)
        ).reshape(-1)
        tc = jax.lax.dynamic_slice(
            tab_c.reshape(n, Nbuf), (0, start), (n, slab)
        ).reshape(-1)
        return chunk(tp) + chunk(tc)

    if not aot:
        return prep
    avals = (
        jax.ShapeDtypeStruct((WK, n * Nbuf), jnp.uint32),
        jax.ShapeDtypeStruct((n * Nbuf,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    with _locfree():
        return prep.lower(*avals).compile()


@functools.lru_cache(maxsize=32)
def _prefix_chunker(WK: int, n: int, S: int, capb: int, m: int, T: int,
                    aot: bool = False):
    """Jitted device program: slice the live prefix of the tables and
    emit it as 2*T equal flat chunks (T per array), so the host can pull
    the chunks over parallel D2H streams.  With `aot` the program is
    compiled immediately through the location-free path so the
    persistent cache serves warm starts (even this small program costs
    ~2 s on a cold remote compile)."""

    def chunk(flat):
        total = flat.shape[0]
        step = -(-total // T)
        return tuple(flat[i * step : (i + 1) * step] for i in range(T))

    @jax.jit
    def prep(tab_p, tab_c):
        tp = tab_p.reshape(WK, n, S, capb)[:, :, :, :m].reshape(-1)
        tc = tab_c.reshape(n, S, capb)[:, :, :m].reshape(-1)
        return chunk(tp) + chunk(tc)

    if not aot:
        return prep
    cap = S * capb
    avals = (
        jax.ShapeDtypeStruct((WK, n * cap), jnp.uint32),
        jax.ShapeDtypeStruct((n * cap,), jnp.int32),
    )
    with _locfree():
        return prep.lower(*avals).compile()


def _live_prefix(tab_p, tab_c, WK: int, plan: _Plan, live_fn=None,
                 aot: bool = False):
    """Download only the live prefix of each chip's table, over parallel
    D2H streams.

    sum_by_key compacts live keys to the front of every chip table, so
    rows beyond the per-chip live count are sentinels.  Slicing on device
    before the transfer matters when device->host bandwidth is scarce
    (the axon tunnel moves ~7-9 MB/s per stream; a full 8M-slot table is
    ~100 MB).  The tunnel multiplexes concurrent streams well — measured
    7.3 -> 35 MB/s with 8 threaded chunk downloads (round 2) — so the
    prefix is pulled as 2x8 flat chunks prepared by one fused device
    program.  m is rounded up to 64k rows per bucket so the chunker
    compiles once, not once per run.
    Returns host arrays shaped (WK, n, max_live) and (n, max_live).
    """
    n, cap, S = plan.n, plan.table_cap, plan.S
    capb = cap // S
    if live_fn is not None:
        live = np.asarray(live_fn(tab_c))
    else:
        live = np.asarray(
            jnp.sum((tab_c > 0).reshape(n, S, capb), axis=2)
        )
    m = max(int(live.max()) if live.size else 0, 1)
    m = min(-(-m // _LIVE_PAD) * _LIVE_PAD, capb)
    prep = _prefix_chunker(WK, n, S, capb, m, _D2H_STREAMS, aot)
    chunks = prep(tab_p, tab_c)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(_D2H_STREAMS) as ex:
        host = list(ex.map(np.asarray, chunks))
    T = _D2H_STREAMS
    tp = np.concatenate(host[:T]).reshape(WK, n, S, m)
    tc = np.concatenate(host[T:]).reshape(n, S, m)
    return tp, tc
