"""Byte-range shard reading (record resync) + parallel batch iterator.

The shard contract (io/native/fastx.cpp fx_open_range, io/fasta.py
iter_sequences): a record belongs to the shard whose [start, end) contains
its header byte offset; shards of a file must reconstruct exactly the full
record set.  No reference analog (single-process tool) — this is the work
unit for -nb-cores reader parallelism and multi-host input sharding.
"""

import gzip

import numpy as np
import pytest

from dsk_tpu.io import native
from dsk_tpu.io.bank import open_bank
from dsk_tpu.io.batch import (
    ReadUnit,
    _units_batch_stream,
    batch_iterator,
    parallel_batch_iterator,
    split_bank_units,
)
from dsk_tpu.io.fasta import iter_sequences


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    """FASTQ whose quality lines START with '@' (the resync trap)."""
    rng = np.random.default_rng(7)
    path = tmp_path_factory.mktemp("rng") / "tricky.fastq"
    with open(path, "wb") as f:
        for i in range(400):
            n = int(rng.integers(30, 120))
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
            # quality deliberately starts with '@' and contains '+' chars
            qual = b"@" + bytes(
                rng.choice(np.frombuffer(b"@+IJKLMNOP", np.uint8), n - 1)
            )
            f.write(b"@read" + str(i).encode() + b" x\n")
            f.write(seq + b"\n+\n" + qual + b"\n")
    return str(path)


@pytest.fixture(scope="module")
def fasta_file(tmp_path_factory):
    rng = np.random.default_rng(8)
    path = tmp_path_factory.mktemp("rng") / "multi.fasta"
    with open(path, "wb") as f:
        for i in range(300):
            n = int(rng.integers(20, 400))
            seq = bytes(rng.choice(np.frombuffer(b"ACGTN", np.uint8), n))
            f.write(b">seq" + str(i).encode() + b"\n")
            # multi-line sequences, 60 cols
            for j in range(0, n, 60):
                f.write(seq[j : j + 60] + b"\n")
    return str(path)


def _all_records(path):
    return [(s.comment, s.data) for s in iter_sequences(path)]


def _shard_records_python(path, cuts):
    out = []
    bounds = [0] + cuts + [None]
    for a, b in zip(bounds[:-1], bounds[1:]):
        out.extend(
            (s.comment, s.data) for s in iter_sequences(path, a, b)
        )
    return out


@pytest.mark.parametrize("fixture", ["fasta_file", "fastq_file"])
@pytest.mark.parametrize("n_shards", [2, 3, 7])
def test_python_shards_reconstruct_file(fixture, n_shards, request):
    path = request.getfixturevalue(fixture)
    import os

    size = os.path.getsize(path)
    cuts = [size * i // n_shards for i in range(1, n_shards)]
    full = _all_records(path)
    sharded = _shard_records_python(path, cuts)
    assert sorted(sharded) == sorted(full)
    assert len(sharded) == len(full)  # no duplicates either


@pytest.mark.parametrize("fixture", ["fasta_file", "fastq_file"])
def test_python_cut_at_every_offset_window(fixture, request):
    """Brute-force: cuts at every byte of a small prefix region still
    partition the records exactly (catches off-by-one resync bugs)."""
    path = request.getfixturevalue(fixture)
    full = _all_records(path)
    for cut in range(1, 400, 7):
        left = list(iter_sequences(path, 0, cut))
        right = list(iter_sequences(path, cut, None))
        got = [(s.comment, s.data) for s in left + right]
        assert got == full, f"cut={cut}"


def _rows_of(batches):
    rows = []
    for b in batches:
        for r in range(b.n_rows):
            rows.append((bytes(b.codes[r].tobytes()), int(b.bank_ids[r])))
    return rows


@pytest.mark.skipif(not native.available(), reason="libdskio.so missing")
@pytest.mark.parametrize("fixture", ["fasta_file", "fastq_file"])
def test_native_shards_match_python(fixture, request):
    import os

    path = request.getfixturevalue(fixture)
    size = os.path.getsize(path)
    cuts = [0, size // 3, (2 * size) // 3, -1]
    k = 15
    for a, b in zip(cuts[:-1], cuts[1:]):
        unit = ReadUnit(path, 0, a, b)
        nat = _rows_of(_units_batch_stream([unit], k, 64, 128, True))
        py = _rows_of(_units_batch_stream([unit], k, 64, 128, False))
        assert nat == py, f"range [{a},{b})"


@pytest.mark.skipif(not native.available(), reason="libdskio.so missing")
def test_native_gz_range_refused(tmp_path, fasta_file):
    gz = tmp_path / "x.fasta.gz"
    with open(fasta_file, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    from dsk_tpu.io.native import NativeReader

    with pytest.raises(FileNotFoundError):
        NativeReader(str(gz), 100, 200)


def test_split_bank_units_gz_whole(data_dir):
    bank = open_bank(str(data_dir / "c1.fasta.gz"))
    units = split_bank_units(bank, 8)
    assert units == [ReadUnit(str(data_dir / "c1.fasta.gz"), 0)]


def test_split_bank_units_plain(fasta_file):
    bank = open_bank(fasta_file)
    units = split_bank_units(bank, 4, min_bytes=1024)
    assert len(units) >= 2
    assert units[0].start == 0
    assert units[-1].end == -1
    for u1, u2 in zip(units[:-1], units[1:]):
        assert u1.end == u2.start


@pytest.mark.parametrize("n_workers", [2, 4])
def test_parallel_batches_match_serial(fasta_file, fastq_file, n_workers):
    bank = open_bank(f"{fasta_file},{fastq_file}")
    k = 21
    serial = _rows_of(batch_iterator(bank, k, 64, 128))
    par = _rows_of(
        parallel_batch_iterator(bank, k, 64, 128, n_workers=n_workers)
    )
    assert sorted(par) == sorted(serial)
    s_stats = [
        (sum(b.n_bases for b in batch_iterator(bank, k, 64, 128)),
         sum(b.n_reads for b in batch_iterator(bank, k, 64, 128)))
    ]
    p_bases = sum(
        b.n_bases
        for b in parallel_batch_iterator(bank, k, 64, 128, n_workers=n_workers)
    )
    assert p_bases == s_stats[0][0]
