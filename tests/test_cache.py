"""2-bit batch cache (BankBinary analog): roundtrip + multipass integration."""

import glob
import os
import tempfile

import numpy as np

from dsk_tpu import oracle
from dsk_tpu.engine.counter import CountEngine
from dsk_tpu.io import cache
from dsk_tpu.io.bank import open_bank
from dsk_tpu.io.batch import batch_iterator
from dsk_tpu.kmer import codec


def test_cache_roundtrip(data_dir, tmp_path):
    bank = open_bank(str(data_dir / "readN.fasta"))
    k, rows, L = 20, 8, 64
    path = str(tmp_path / "c.bin")
    w = cache.BatchCacheWriter(path, k, rows, L)
    orig = []
    for b in batch_iterator(bank, k, rows, L):
        w.append(b)
        orig.append(
            (b.codes.copy(), b.bank_ids.copy(), b.n_rows, b.n_bases, b.n_reads)
        )
    w.close()
    back = list(cache.read_batches(path))
    assert len(back) == len(orig)
    for b, (codes, bids, n_rows, n_bases, n_reads) in zip(back, orig):
        # codes match where valid; pad positions are both PAD
        np.testing.assert_array_equal(b.codes, codes)
        np.testing.assert_array_equal(b.bank_ids, bids)
        assert (b.n_rows, b.n_bases, b.n_reads) == (n_rows, n_bases, n_reads)


def test_cache_preserves_invalid_positions(tmp_path):
    from dsk_tpu.io.batch import PAD, Batch

    codes = np.full((2, 16), PAD, dtype=np.uint8)
    codes[0, :8] = [0, 1, 2, 3, PAD, 3, 2, 1]  # invalid base mid-read
    path = str(tmp_path / "c.bin")
    w = cache.BatchCacheWriter(path, 4, 2, 16)
    w.append(Batch(codes, np.zeros(2, np.int32), 1, 8, 1))
    w.close()
    (b,) = list(cache.read_batches(path))
    np.testing.assert_array_equal(b.codes, codes)


def test_multipass_uses_cache_and_matches(data_dir, tmp_path, monkeypatch):
    # multipass with cache must equal single pass; cache file cleaned up
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None  # force re-read of TMPDIR
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = CountEngine(27, batch_rows=512, row_len=128)
    res = eng.count(uri, n_passes=3)
    expected = oracle.count_bank(uri, 27)
    got = {codec.words_to_value(r): int(a) for r, a in zip(res.kmers, res.counts)}
    assert got == expected
    leftovers = glob.glob(str(tmp_path / "dsk_tpu_cache_*"))
    assert leftovers == []
    tempfile.tempdir = None


def test_multipass_disk_budget_fallback(data_dir, tmp_path, monkeypatch):
    """A -max-disk budget too small for the cache must NOT fail the run:
    caching aborts, later passes re-read the bank, counts stay exact
    (the reference enforces a disk budget, README.md:130)."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = CountEngine(27, batch_rows=512, row_len=128)
    res = eng.count(uri, n_passes=3, max_disk_mb=0)  # auto: plenty
    eng2 = CountEngine(27, batch_rows=512, row_len=128)
    # force a 16 KB budget: the cache aborts almost immediately
    from dsk_tpu.io import cache as bcache

    orig = bcache.BatchCacheWriter

    def tiny_writer(path, k, batch_rows, row_len, max_bytes=None):
        return orig(path, k, batch_rows, row_len, max_bytes=16 << 10)

    monkeypatch.setattr(bcache, "BatchCacheWriter", tiny_writer)
    res2 = eng2.count(uri, n_passes=3)
    g1 = {codec.words_to_value(r): int(a) for r, a in zip(res.kmers, res.counts)}
    g2 = {codec.words_to_value(r): int(a) for r, a in zip(res2.kmers, res2.counts)}
    assert g1 == g2
    assert glob.glob(str(tmp_path / "dsk_tpu_cache_*")) == []
    tempfile.tempdir = None
