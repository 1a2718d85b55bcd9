"""Device pipeline (extract + sort-count) vs the oracle and golden fixtures."""

import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.engine.counter import CountEngine
from dsk_tpu.kmer import codec
from tests.conftest import load_histo_fixture


def result_as_dict(res):
    return {codec.words_to_value(row): int(a) for row, a in zip(res.kmers, res.counts)}


def assert_matches_oracle(res, bank_uri, k):
    expected = oracle.count_bank(bank_uri, k)
    got = result_as_dict(res)
    assert got == expected


@pytest.mark.parametrize("k", [11, 16, 27, 31, 32])
def test_small_vs_oracle(data_dir, k):
    uri = str(data_dir / "readN.fasta")
    res = CountEngine(k, batch_rows=8, row_len=64).count(uri)
    assert_matches_oracle(res, uri, k)


@pytest.mark.parametrize("k", [33, 48, 63, 64])
def test_large_k_multiword(data_dir, k):
    # multi-word kmers (W>2), chunked long rows
    uri = str(data_dir / "readN.fasta")
    res = CountEngine(k, batch_rows=8, row_len=96).count(uri)
    assert_matches_oracle(res, uri, k)
    assert res.kmers.shape[1] == codec.words_per_kmer(k)


def test_k27_fixture_histogram(data_dir):
    # the reference's main golden test (scripts/simple_test.sh:36-39)
    res = CountEngine(27, batch_rows=512, row_len=128).count(
        str(data_dir / "read50x_ref10K_e001.fasta.gz")
    )
    expected = load_histo_fixture(data_dir / "k27.histo")
    got = {a: int(res.histogram[a]) for a in range(1, 10001)}
    assert got == expected


def test_k27_exact_counts_vs_oracle(data_dir):
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    res = CountEngine(27, batch_rows=512, row_len=128).count(uri)
    assert_matches_oracle(res, uri, 27)


def test_longread_chunking(data_dir):
    # reads longer than row_len exercise the (k-1)-halo chunking
    uri = str(data_dir / "longread.fasta")
    res = CountEngine(27, batch_rows=256, row_len=100).count(uri)
    expected = load_histo_fixture(data_dir / "rlong.histo")
    got = {a: int(res.histogram[a]) for a in range(1, 10001)}
    assert got == expected


def test_flush_invariance(data_dir):
    # counting must be invariant to buffer flush boundaries (multi-merge path)
    uri = str(data_dir / "readN.fasta")
    a = CountEngine(20, batch_rows=2, row_len=64, flush_items=64).count(uri)
    b = CountEngine(20, batch_rows=8, row_len=64, flush_items=1 << 22).count(uri)
    assert result_as_dict(a) == result_as_dict(b)


def test_shortread_dump(data_dir):
    res = CountEngine(15, batch_rows=4, row_len=32).count(
        str(data_dir / "shortread.fasta")
    )
    lines = res.dump_text(abundance_min=1)
    with open(data_dir / "short.parse_results") as f:
        expected = [ln.strip() for ln in f if ln.strip()]
    assert lines == expected


def test_empty_result(data_dir):
    res = CountEngine(16, batch_rows=4, row_len=32).count(
        str(data_dir / "shortread.fasta")
    )
    assert res.n_distinct == 0
    assert res.histogram.sum() == 0
