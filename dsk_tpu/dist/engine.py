"""Multi-chip counting engine: shard_map + all_to_all k-mer routing.

The TPU re-design of the reference's partitioned counting (SURVEY.md P2-P4,
section 2.4).  In DSK, k-mers are routed by hash/minimizer to partition
FILES on disk, then each partition is sorted/counted independently
(doc/paper.tex:71-91).  Here:

  * reads are data-parallel over the chip mesh axis (each chip extracts
    canonical k-mers from its shard of the batch — the thread-pool fill
    phase, P3),
  * each k-mer is routed to its OWNER chip by a mixed hash of its words
    via `lax.all_to_all` over ICI (the partition files, P2),
  * each chip appends received k-mers into a device-resident accumulation
    buffer (HBM replaces disk) and periodically merges the buffer into its
    running distinct-kmer table with sort + segment-reduce (the
    per-partition counting, P4),
  * the abundance histogram is merged with `psum` (the stats merge).

Everything is static-shaped: the per-destination send capacity is fixed
(mean + slack), overflow is *counted* on device and checked on host at
the end (v1: raise; the multi-pass retry valve mirrors the reference's
n_iters semantics, doc/paper.tex:66).  The flush schedule is static
(every `buf_batches` batches), so a whole pass compiles to a handful of
XLA executables with no host round-trips in the loop.

Output tables are partitioned by owner chip — partition p of the output
store is chip p's table, sorted ascending (the analog of dsk/solid/<i>).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dsk_tpu.engine import processors
from dsk_tpu.engine.counter import CountResult
from dsk_tpu.io.bank import Bank, open_bank
from dsk_tpu.io.batch import batch_iterator
from dsk_tpu.kmer import codec
from dsk_tpu.kmer.device import (
    SENTINEL,
    extract_canonical,
    kmer_hash,
    sum_by_key,
)

AXIS = "chips"


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


@dataclass
class _Plan:
    """Static shapes of one distributed pass."""

    n: int            # chips
    rows_per_chip: int
    nw: int           # windows per row
    send_cap: int     # per-destination bucket capacity C
    recv_per_batch: int   # n * C
    buf_batches: int
    buf_cap: int      # buf_batches * recv_per_batch
    table_cap: int


class DistCountEngine:
    """Canonical k-mer counter over a chip mesh.

    send_slack: per-destination capacity = slack * mean routed volume; the
    frequency skew headroom (the reference balances partitions with
    frequency-aware minimizer repartition, SURVEY.md C6 — hash routing
    plus slack plays that role here).
    """

    def __init__(
        self,
        k: int,
        mesh: Mesh | None = None,
        batch_rows: int = 1024,
        row_len: int = 256,
        send_slack: float = 2.0,
        buf_batches: int = 8,
        table_cap: int = 1 << 20,
        nb_bins: int = 10000,
        n_passes: int = 1,
    ):
        self.k = k
        self.n_passes = n_passes
        self.W = codec.words_per_kmer(k)
        self.mesh = mesh or default_mesh()
        self.n = self.mesh.devices.size
        self.row_len = max(row_len, k)
        self.rows_per_chip = max(1, batch_rows // self.n)
        self.batch_rows = self.rows_per_chip * self.n
        nw = self.row_len - k + 1
        per_chip_windows = self.rows_per_chip * nw
        send_cap = int(np.ceil(per_chip_windows / self.n * send_slack))
        send_cap = min(max(send_cap, 64), per_chip_windows)
        self.plan = _Plan(
            n=self.n,
            rows_per_chip=self.rows_per_chip,
            nw=nw,
            send_cap=send_cap,
            recv_per_batch=self.n * send_cap,
            buf_batches=buf_batches,
            buf_cap=buf_batches * self.n * send_cap,
            table_cap=table_cap,
        )
        self.nb_bins = nb_bins
        self._build()

    # -- jitted programs -------------------------------------------------

    def _build(self):
        k, W, plan, mesh = self.k, self.W, self.plan, self.mesh
        n = plan.n

        n_passes = self.n_passes

        def route_shard(batch, buf_w, buf_c, over, slot, pass_sel):
            """Per-chip: extract + hash-route + append to buffer.

            batch: (rows_per_chip, L) uint8;  buf_w: (buf_cap, W);
            buf_c: (buf_cap,); over: (1,) int32; slot/pass_sel: () int32
            replicated.
            """
            words, valid = extract_canonical(batch, k)
            m = plan.rows_per_chip * plan.nw
            flat = words.reshape(m, W)
            weights = valid.reshape(m).astype(jnp.int32)

            if n_passes > 1:
                # multi-pass selection (reference n_iters, doc/paper.tex:74);
                # rejected rows become full sentinels so they cannot occupy
                # table capacity
                from dsk_tpu.kmer.device import pass_hash

                sel = (pass_hash(flat) % jnp.uint32(n_passes)) == pass_sel.astype(
                    jnp.uint32
                )
                keep = sel & (weights > 0)
                flat = jnp.where(keep[:, None], flat, SENTINEL)
                weights = jnp.where(keep, weights, 0)

            # local pre-aggregation: collapse duplicate kmers BEFORE routing
            # so a hot kmer travels as one (kmer, weight) record per batch —
            # without this any skewed input overflows the per-destination
            # capacity (and ICI traffic shrinks by the local duplication
            # factor; the reference's superkmer compression plays this role)
            flat, weights, _ = sum_by_key(flat, weights)

            owner = (kmer_hash(flat) % jnp.uint32(n)).astype(jnp.int32)
            owner = jnp.where(weights > 0, owner, n)  # sentinels sort last

            # sort by owner, carrying (words, weights)
            ops = (owner,) + tuple(flat[:, w] for w in range(W)) + (weights,)
            s = jax.lax.sort(ops, num_keys=1)
            sowner, skey, sweights = s[0], s[1 : 1 + W], s[1 + W]

            # position within owner group (owner-sorted -> group starts
            # are where owner changes; cummax gives each row its start)
            idx = jnp.arange(m, dtype=jnp.int32)
            is_new = jnp.ones((m,), jnp.bool_).at[1:].set(sowner[1:] != sowner[:-1])
            group_start = jax.lax.cummax(jnp.where(is_new, idx, 0), axis=0)
            pos = idx - group_start

            C = plan.send_cap
            # scatter into (n, C) send buckets; OOB (owner==n, pos>=C) drop
            send_w = jnp.full((n, C, W), SENTINEL)
            send_c = jnp.zeros((n, C), jnp.int32)
            skey_m = jnp.stack(skey, axis=-1)  # (m, W)
            send_w = send_w.at[sowner, pos].set(skey_m, mode="drop")
            send_c = send_c.at[sowner, pos].set(sweights, mode="drop")
            over = over + jnp.sum(
                (sweights > 0) & (sowner < n) & (pos >= C)
            ).astype(jnp.int32)[None]

            # the partition-file write: all_to_all over ICI
            recv_w = jax.lax.all_to_all(send_w, AXIS, split_axis=0, concat_axis=0)
            recv_c = jax.lax.all_to_all(send_c, AXIS, split_axis=0, concat_axis=0)

            off = slot * plan.recv_per_batch
            buf_w = jax.lax.dynamic_update_slice(
                buf_w, recv_w.reshape(plan.recv_per_batch, W), (off, 0)
            )
            buf_c = jax.lax.dynamic_update_slice(
                buf_c, recv_c.reshape(plan.recv_per_batch), (off,)
            )
            return buf_w, buf_c, over

        def flush_shard(buf_w, buf_c, tab_w, tab_c, tover):
            """Per-chip: merge buffer + running table -> new table."""
            words = jnp.concatenate([buf_w, tab_w], axis=0)
            weights = jnp.concatenate([buf_c, tab_c], axis=0)
            uniq, counts, n_uniq = sum_by_key(words, weights)
            tover = tover + (n_uniq > plan.table_cap).astype(jnp.int32)[None]
            new_w = uniq[: plan.table_cap]
            new_c = counts[: plan.table_cap]
            buf_w = jnp.full((plan.buf_cap, W), SENTINEL)
            buf_c = jnp.zeros((plan.buf_cap,), jnp.int32)
            return buf_w, buf_c, new_w, new_c, tover

        def hist_shard(tab_c):
            # int32 bins on device (TPU has no native int64); widened on host
            mask = tab_c > 0
            bins = jnp.where(mask, jnp.clip(tab_c, 1, self.nb_bins), 0)
            h = jnp.zeros(self.nb_bins + 1, jnp.int32)
            h = h.at[bins].add(mask.astype(jnp.int32)).at[0].set(0)
            return jax.lax.psum(h, AXIS)

        pb = P(AXIS)       # sharded on leading axis
        pr = P()           # replicated
        shmap = functools.partial(jax.shard_map, mesh=mesh)

        self._route = jax.jit(
            shmap(
                route_shard,
                in_specs=(pb, pb, pb, pb, pr, pr),
                out_specs=(pb, pb, pb),
            ),
            donate_argnums=(1, 2, 3),
        )
        self._flush = jax.jit(
            shmap(
                flush_shard,
                in_specs=(pb, pb, pb, pb, pb),
                out_specs=(pb, pb, pb, pb, pb),
            ),
            donate_argnums=(0, 1, 2, 3, 4),
        )
        self._hist = jax.jit(
            shmap(hist_shard, in_specs=(pb,), out_specs=pr)
        )

    def _init_state(self):
        plan, W = self.plan, self.W
        shard = NamedSharding(self.mesh, P(AXIS))

        def mk(shape, fill, dtype):
            return jax.device_put(jnp.full(shape, fill, dtype), shard)

        buf_w = mk((plan.n * plan.buf_cap, W), SENTINEL, jnp.uint32)
        buf_c = mk((plan.n * plan.buf_cap,), 0, jnp.int32)
        tab_w = mk((plan.n * plan.table_cap, W), SENTINEL, jnp.uint32)
        tab_c = mk((plan.n * plan.table_cap,), 0, jnp.int32)
        over = mk((plan.n,), 0, jnp.int32)
        tover = mk((plan.n,), 0, jnp.int32)
        return buf_w, buf_c, tab_w, tab_c, over, tover

    # -- driver ----------------------------------------------------------

    def count(self, bank: Bank | str) -> CountResult:
        if isinstance(bank, str):
            bank = open_bank(bank)
        if self.n_passes <= 1:
            return self.count_stream(
                batch_iterator(bank, self.k, self.batch_rows, self.row_len),
                nb_banks=bank.nb_banks,
            )
        from dsk_tpu.engine.counter import merge_pass_results

        results = [
            self.count_stream(
                batch_iterator(bank, self.k, self.batch_rows, self.row_len),
                nb_banks=bank.nb_banks,
                pass_id=p,
            )
            for p in range(self.n_passes)
        ]
        return merge_pass_results(results)

    def count_stream(
        self, batches, nb_banks: int = 1, pass_id: int = 0
    ) -> CountResult:
        """Count over an iterable of Batch objects (core loop; count() wraps
        it with the bank reader, dryrun/bench feed synthetic batches)."""
        k, W, plan = self.k, self.W, self.plan

        buf_w, buf_c, tab_w, tab_c, over, tover = self._init_state()
        slot = 0
        n_bases = 0
        n_reads = 0

        for batch in batches:
            batch_dev = jax.device_put(
                jnp.asarray(batch.codes), NamedSharding(self.mesh, P(AXIS))
            )
            buf_w, buf_c, over = self._route(
                batch_dev, buf_w, buf_c, over, jnp.int32(slot), jnp.int32(pass_id)
            )
            n_bases += batch.n_bases
            n_reads += batch.n_reads
            slot += 1
            if slot == plan.buf_batches:
                buf_w, buf_c, tab_w, tab_c, tover = self._flush(
                    buf_w, buf_c, tab_w, tab_c, tover
                )
                slot = 0
        if slot:
            buf_w, buf_c, tab_w, tab_c, tover = self._flush(
                buf_w, buf_c, tab_w, tab_c, tover
            )

        n_over = int(np.asarray(over).sum())
        if n_over:
            raise RuntimeError(
                f"routing overflow: {n_over} kmers exceeded the "
                f"per-destination capacity {plan.send_cap}; raise send_slack"
            )
        if int(np.asarray(tover).sum()):
            raise RuntimeError(
                f"table overflow: >{plan.table_cap} distinct kmers on a "
                f"chip; raise table_cap (or use more chips)"
            )

        hist = np.asarray(self._hist(tab_c), dtype=np.int64)

        # gather per-chip tables -> host partitions (partition p = chip p)
        tw = np.asarray(tab_w).reshape(plan.n, plan.table_cap, W)
        tc = np.asarray(tab_c).reshape(plan.n, plan.table_cap)
        parts_w, parts_c, sizes = [], [], []
        for p in range(plan.n):
            m = tc[p] > 0
            parts_w.append(tw[p][m])
            parts_c.append(tc[p][m])
            sizes.append(int(m.sum()))
        kmers = np.concatenate(parts_w, axis=0) if parts_w else np.empty((0, W), np.uint32)
        counts = np.concatenate(parts_c, axis=0) if parts_c else np.empty((0,), np.int32)

        return CountResult(
            k=k,
            kmers=kmers,
            counts=counts,
            histogram=hist,
            info={
                "n_bases": n_bases,
                "n_reads": n_reads,
                "nb_banks": nb_banks,
                "n_chips": plan.n,
                "partition_sizes": sizes,
            },
        )
