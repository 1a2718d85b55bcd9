"""Host-side partition spill: the disk half of DSK's fill/count split.

The reference bounds memory at M REGARDLESS of input scale because the
fill phase writes hash-routed k-mers to disk partition files and the
count phase loads ONE partition at a time (doc/paper.tex:71-91; the
human genome runs in 7 passes x 86 partitions within 4 GB,
doc/human_log:4).  Without spill, dsk_tpu's only per-pass capacity is
the per-chip HBM table, so the pass count scales with distinct/HBM —
the VERDICT r3 "biggest remaining architectural gap".

Spill mode restores the fixed-memory contract, TPU-style:

  fill:   each chip extracts + pass-filters its batch shard, DEDUPES the
          flush group on device (sort + unit-weight compaction — the
          group's duplicates collapse BEFORE any byte leaves HBM, so
          spill traffic is <= DSK's disk traffic, which writes every
          occurrence), partition-sorts the survivors by a kmer hash, and
          streams the (kmer words, count) records D2H into host
          partition buckets (this module).  No collectives: spill fill
          is pure data parallelism.
  count:  partitions are counted ONE BATCH OF n AT A TIME — chip j
          merges chunks of partition batch[j] into its HBM table
          (weighted sort + segment-reduce), then the live rows stream to
          the output sink.  Partition-parallel, collective-free: the
          per-partition counting of the reference (P4) mapped to chips.

Records are (W kmer words + 1 count word) x uint32, row-major — the
2-bit-packed partition file analog (kmers ARE 2 bits/base in word
planes; doc/paper.tex:104).  A partition whose distinct count overflows
the HBM table is SPLIT in place (hash modulus doubling: residue r mod M
-> children r and r+M mod 2M), a local valve that re-reads only the
offending bucket — never the input.
"""

from __future__ import annotations

import os

import numpy as np


class SpillDiskOverflow(RuntimeError):
    """The spill store exceeded its disk budget (-max-disk).  Retry
    valve: more passes (per-pass spill volume ~ 1/n_passes) — exactly
    the reference's n_iters = ceil(v*b/D) rule (doc/paper.tex:66)."""


def kmer_hash_planes_np(planes: list[np.ndarray]) -> np.ndarray:
    """Bit-exact numpy mirror of kmer/device.py kmer_hash_planes (the
    partition-routing hash): the host-side split of an overflowing
    partition must agree with the device's pid assignment.  Computed in
    uint64 with explicit masking — numpy integer overflow semantics are
    dtype-dependent, the mask is not.  Parity is pinned by
    tests/test_spill.py."""
    M = np.uint64(0xFFFFFFFF)
    h = np.full(planes[0].shape, 0x9E3779B9, np.uint64)
    for p in planes:
        h = ((h ^ p.astype(np.uint64)) * np.uint64(0x85EBCA6B)) & M
        h = h ^ (h >> np.uint64(13))
    h = (h * np.uint64(0xC2B2AE35)) & M
    return (h ^ (h >> np.uint64(16))).astype(np.uint32)


class SpillStore:
    """Append-only per-partition record files under one directory.

    Record = (WK uint32 key words + 1 uint32 count) per row.  Appends
    go through a bounded pool of open file handles (the reference's
    figure-1 sweep DIES at "too many open files" with many partitions,
    doc/figure-1/droso_log:7 — the LRU pool makes that failure mode
    structurally impossible here).  max_disk_mb > 0 bounds total bytes
    on disk; exceeding it raises SpillDiskOverflow (the engine's
    more-passes valve).
    """

    MAX_OPEN = 64

    def __init__(self, root: str, wk: int, max_disk_mb: int = 0,
                 host: int = 0, n_hosts: int = 1,
                 hash_words: int | None = None):
        """host/n_hosts: multi-process mode — `root` is a SHARED
        directory (the reference's filesystem-as-interconnect,
        doc/paper.tex:71-76); each process appends only its own
        host-suffixed files, and the count phase reads EVERY host's
        files for the partitions it owns (read_chunk_all).

        hash_words: how many LEADING key words the partition hash
        covers (default: all wk).  Per-bank records carry the sub-bank
        id as an extra least-significant key word that must NOT enter
        the routing hash — every bank's copies of a kmer have to land
        in one partition so the count phase can group them per kmer
        (the reference's per-partition CountProcessor chain sees all
        banks of a kmer together, doc/paper.tex:71-91)."""
        self.root = root
        self.wk = wk
        self.hash_words = hash_words if hash_words is not None else wk
        self.host = host
        self.n_hosts = n_hosts
        self.rec_bytes = 4 * (wk + 1)
        self.budget = max_disk_mb << 20 if max_disk_mb > 0 else 0
        self.bytes_written = 0
        self._rows: dict[int, int] = {}
        self._open: dict[int, object] = {}  # pid -> handle (LRU by dict order)
        os.makedirs(root, exist_ok=True)

    def _path(self, pid: int, host: int | None = None) -> str:
        h = self.host if host is None else host
        return os.path.join(self.root, f"part_{pid:05d}_h{h:03d}.bin")

    def _handle(self, pid: int):
        h = self._open.pop(pid, None)
        if h is None:
            if len(self._open) >= self.MAX_OPEN:
                oldest = next(iter(self._open))
                self._open.pop(oldest).close()
            h = open(self._path(pid), "ab")
        self._open[pid] = h  # re-insert: most recently used last
        return h

    def append(self, pid: int, rows: np.ndarray) -> None:
        """rows: (N, WK+1) uint32 (count in the last column, int32
        bitcast).  N == 0 is a no-op."""
        n = rows.shape[0]
        if n == 0:
            return
        nb = n * self.rec_bytes
        if self.budget and self.bytes_written + nb > self.budget:
            raise SpillDiskOverflow(
                f"spill store would exceed -max-disk "
                f"({self.budget >> 20} MB) at partition {pid}; "
                f"more passes needed"
            )
        self._handle(pid).write(np.ascontiguousarray(rows, np.uint32))
        self.bytes_written += nb
        self._rows[pid] = self._rows.get(pid, 0) + n

    def rows(self, pid: int) -> int:
        return self._rows.get(pid, 0)

    def partitions(self) -> list[int]:
        return sorted(p for p, n in self._rows.items() if n > 0)

    # -- cross-host views (multi-process count phase) --------------------

    def rows_all(self, pid: int) -> int:
        """Rows of pid across EVERY host's file (shared dir)."""
        if self.n_hosts <= 1:
            return self.rows(pid)
        self._flush(pid)
        total = 0
        for h in range(self.n_hosts):
            p = self._path(pid, h)
            if os.path.exists(p):
                total += os.path.getsize(p) // self.rec_bytes
        return total

    def read_chunk_all(
        self, pid: int, start_row: int, n_rows: int
    ) -> np.ndarray:
        """Rows [start, start+n) of pid over the host-ordered
        concatenation of every host's file."""
        if self.n_hosts <= 1:
            return self.read_chunk(pid, start_row, n_rows)
        self._flush(pid)
        parts = []
        need = n_rows
        off = start_row
        for h in range(self.n_hosts):
            p = self._path(pid, h)
            if not os.path.exists(p):
                continue
            rows_h = os.path.getsize(p) // self.rec_bytes
            if off >= rows_h:
                off -= rows_h
                continue
            m = min(need, rows_h - off)
            parts.append(
                np.fromfile(
                    p, dtype=np.uint32, count=m * (self.wk + 1),
                    offset=off * self.rec_bytes,
                ).reshape(m, self.wk + 1)
            )
            need -= m
            off = 0
            if need == 0:
                break
        if not parts:
            return np.empty((0, self.wk + 1), np.uint32)
        return np.concatenate(parts, axis=0)

    def _flush(self, pid: int) -> None:
        h = self._open.get(pid)
        if h is not None:
            h.flush()

    def read_chunk(self, pid: int, start_row: int, n_rows: int) -> np.ndarray:
        """Rows [start_row, start_row+n_rows) of partition pid as
        (m, WK+1) uint32 (m <= n_rows at the tail)."""
        self._flush(pid)
        avail = self.rows(pid) - start_row
        m = max(min(n_rows, avail), 0)
        if m == 0:
            return np.empty((0, self.wk + 1), np.uint32)
        out = np.fromfile(
            self._path(pid),
            dtype=np.uint32,
            count=m * (self.wk + 1),
            offset=start_row * self.rec_bytes,
        )
        return out.reshape(m, self.wk + 1)

    def split(self, pid: int, modulus: int, residue: int, new_pid: int) -> None:
        """Split partition pid (records satisfy hash % modulus == residue)
        into pid (hash % 2*modulus == residue) and new_pid (== residue +
        modulus), by re-hashing the stored key words on the host.  The
        local overflow valve: only this bucket's bytes are re-read, never
        the input (the reference resolves skew the same way — more,
        smaller partitions; doc/paper.tex:66-67).

        Multi-process: the OWNER host splits every host's file of pid in
        place (exclusive ownership — fill is complete before counting
        starts, so no concurrent writers) and collects the hi halves
        into its own new_pid file."""
        self._flush(pid)
        h = self._open.pop(pid, None)
        if h is not None:
            h.close()
        hi_parts = []
        for host in range(max(self.n_hosts, 1)):
            p = self._path(pid, host)
            if not os.path.exists(p):
                continue
            rows = np.fromfile(p, dtype=np.uint32).reshape(
                -1, self.wk + 1
            )
            hashes = kmer_hash_planes_np(
                [rows[:, w] for w in range(self.hash_words)]
            )
            hi = (hashes % np.uint32(2 * modulus)) == np.uint32(
                residue + modulus
            )
            lo_rows = rows[~hi]
            hi_parts.append(rows[hi])
            tmp = p + ".tmp"
            np.ascontiguousarray(lo_rows).tofile(tmp)
            os.replace(tmp, p)
            if host == self.host:
                self._rows[pid] = int(lo_rows.shape[0])
        hi_rows = (
            np.concatenate(hi_parts)
            if hi_parts
            else np.empty((0, self.wk + 1), np.uint32)
        )
        np.ascontiguousarray(hi_rows).tofile(self._path(new_pid))
        self._rows[new_pid] = int(hi_rows.shape[0])
        # a split rewrites, it does not grow: budget accounting unchanged

    def close(self) -> None:
        for h in self._open.values():
            h.close()
        self._open.clear()

    def delete(self) -> None:
        self.close()
        for pid in list(self._rows):
            p = self._path(pid)
            if os.path.exists(p):
                os.unlink(p)
        self._rows.clear()
        self.bytes_written = 0
        try:
            os.rmdir(self.root)
        except OSError:
            pass
