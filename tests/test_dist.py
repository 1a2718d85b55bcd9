"""Distributed engine on the simulated 8-device CPU mesh vs oracle/fixtures."""

import jax
import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.dist.engine import DistCountEngine, default_mesh, kmer_hash
from dsk_tpu.kmer import codec
from tests.conftest import load_histo_fixture


def result_as_dict(res):
    return {codec.words_to_value(row): int(a) for row, a in zip(res.kmers, res.counts)}


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("k", [15, 27, 33])
def test_dist_vs_oracle_readN(data_dir, k):
    uri = str(data_dir / "readN.fasta")
    eng = DistCountEngine(k, batch_rows=16, row_len=64, table_cap=1 << 12)
    res = eng.count(uri)
    assert result_as_dict(res) == oracle.count_bank(uri, k)
    assert res.info["n_chips"] == 8


def test_dist_k27_fixture(data_dir):
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = DistCountEngine(27, batch_rows=512, row_len=128, table_cap=1 << 15)
    res = eng.count(uri)
    expected = load_histo_fixture(data_dir / "k27.histo")
    got = {a: int(res.histogram[a]) for a in range(1, 10001)}
    assert got == expected
    # exact counts, not just the histogram
    assert result_as_dict(res) == oracle.count_bank(uri, 27)


def test_dist_partitioning_is_by_hash(data_dir):
    # every kmer must live in partition hash(kmer) % n_chips
    uri = str(data_dir / "readN.fasta")
    eng = DistCountEngine(20, batch_rows=16, row_len=64, table_cap=1 << 12)
    res = eng.count(uri)
    sizes = res.info["partition_sizes"]
    assert sum(sizes) == res.n_distinct
    owners = np.asarray(kmer_hash(res.kmers) % np.uint32(8))
    start = 0
    for p, s in enumerate(sizes):
        assert (owners[start : start + s] == p).all()
        start += s


def test_dist_matches_single_chip(data_dir):
    from dsk_tpu.engine.counter import CountEngine

    uri = str(data_dir / "longread.fasta")
    a = DistCountEngine(31, batch_rows=64, row_len=128, table_cap=1 << 14).count(uri)
    b = CountEngine(31, batch_rows=64, row_len=128).count(uri)
    assert result_as_dict(a) == result_as_dict(b)
    np.testing.assert_array_equal(a.histogram, b.histogram)


def test_single_device_per_batch_wire(data_dir):
    """n == 1 engines stream PER-BATCH transfers assembled by a device-
    side stack (the production single-chip wire path); results must be
    identical to the simple engine, including a padded partial final
    group."""
    import jax

    from dsk_tpu.dist.engine import AXIS, Mesh
    from dsk_tpu.engine.counter import CountEngine

    mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    a = DistCountEngine(
        27, mesh=mesh, batch_rows=64, row_len=128, table_cap=1 << 17,
        buf_batches=3,  # stream length not divisible by 3: pads the tail
    ).count(uri)
    b = CountEngine(27, batch_rows=64, row_len=128).count(uri)
    assert result_as_dict(a) == result_as_dict(b)
    np.testing.assert_array_equal(a.histogram, b.histogram)


def test_dist_overflow_detection(data_dir):
    # absurdly small send capacity must raise, not silently drop kmers
    eng = DistCountEngine(
        21, batch_rows=512, row_len=128, send_slack=0.01, table_cap=1 << 14
    )
    with pytest.raises(RuntimeError, match="overflow"):
        eng.count(str(data_dir / "read50x_ref10K_e001.fasta.gz"))


def test_dist_per_bank(data_dir):
    from dsk_tpu import oracle as _oracle

    files = ",".join(str(data_dir / f"c{i}.fasta.gz") for i in (1, 2, 3))
    eng = DistCountEngine(
        27, batch_rows=256, row_len=128, table_cap=1 << 14, per_bank=True
    )
    res = eng.count(files, per_bank=True)
    assert res.bank_counts is not None and res.bank_counts.shape[1] == 3
    np.testing.assert_array_equal(
        res.bank_counts.sum(axis=1), res.counts.astype(np.int64)
    )
    expected = _oracle.count_bank_per_bank(files, 27)
    got = {
        codec.words_to_value(row): vec
        for row, vec in zip(res.kmers, res.bank_counts)
    }
    assert set(got) == set(expected)
    for v, vec in expected.items():
        np.testing.assert_array_equal(got[v], vec)
    # totals histogram consistent with totals
    assert int(res.histogram[1:].sum()) == res.n_distinct


def test_dist_per_bank_multipass(data_dir):
    files = ",".join(str(data_dir / f"c{i}.fasta.gz") for i in (1, 2))
    a = DistCountEngine(
        27, batch_rows=256, row_len=128, table_cap=1 << 14,
        per_bank=True, n_passes=2,
    ).count(files, per_bank=True)
    b = DistCountEngine(
        27, batch_rows=256, row_len=128, table_cap=1 << 14, per_bank=True
    ).count(files, per_bank=True)
    assert result_as_dict(a) == result_as_dict(b)
    ga = {codec.words_to_value(r): tuple(v) for r, v in zip(a.kmers, a.bank_counts)}
    gb = {codec.words_to_value(r): tuple(v) for r, v in zip(b.kmers, b.bank_counts)}
    assert ga == gb


@pytest.mark.parametrize("where", ["flush", "route"])
def test_bucketized_flush_matches_oracle(data_dir, where):
    """flush_buckets > 1 in both variants: bucketize once per group at
    flush time (flat buffer + one 1-key partition sort, the default) or
    per batch at route/append time (the round-2 original)."""
    from dsk_tpu import oracle
    from dsk_tpu.kmer import codec

    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = DistCountEngine(
        27, batch_rows=256, row_len=128, table_cap=1 << 15,
        flush_buckets=32, bucketize_at=where,
    )
    assert eng.plan.S > 1
    assert eng.flat_buffer == (where == "flush")
    if where == "flush":
        assert eng.plan.flush_cols % 128 == 0 and eng.plan.flush_cols > 0
    res = eng.count(uri)
    want = oracle.count_bank(uri, 27)
    got = {
        codec.words_to_value(r): int(c)
        for r, c in zip(res.kmers, res.counts)
    }
    assert got == want


@pytest.mark.parametrize("where", ["flush", "route"])
def test_bucketized_multichip_per_bank(data_dir, where):
    """Bucketized flush composes with the 8-chip mesh, multi-pass and
    per-bank mode (bank id rides as an extra key word)."""
    from dsk_tpu import oracle
    from dsk_tpu.kmer import codec

    files = ",".join(
        [str(data_dir / "c1.fasta.gz"), str(data_dir / "c2.fasta.gz")]
    )
    eng = DistCountEngine(
        27, batch_rows=256, row_len=128, table_cap=1 << 14,
        flush_buckets=16, bucketize_at=where, per_bank=True, n_passes=2,
    )
    assert eng.plan.S > 1
    res = eng.count(files, per_bank=True)
    want = oracle.count_bank_per_bank(files, 27)
    got = {
        codec.words_to_value(r): int(c)
        for r, c in zip(res.kmers, res.counts)
    }
    assert got == {kk: int(v.sum()) for kk, v in want.items()}
    gotb = {
        codec.words_to_value(r): tuple(int(x) for x in v)
        for r, v in zip(res.kmers, res.bank_counts)
    }
    assert gotb == {kk: tuple(int(x) for x in v) for kk, v in want.items()}
