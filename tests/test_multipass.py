"""Multi-pass counting (bounded-memory n_iters analog) + resource planner."""

import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.engine.counter import CountEngine
from dsk_tpu.engine.planner import plan_resources
from dsk_tpu.kmer import codec
from tests.conftest import load_histo_fixture


def result_as_dict(res):
    return {codec.words_to_value(row): int(a) for row, a in zip(res.kmers, res.counts)}


@pytest.mark.parametrize("n_passes", [2, 3])
def test_multipass_matches_single(data_dir, n_passes):
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = CountEngine(27, batch_rows=512, row_len=128)
    multi = eng.count(uri, n_passes=n_passes)
    assert multi.info["n_passes"] == n_passes
    assert result_as_dict(multi) == oracle.count_bank(uri, 27)
    expected = load_histo_fixture(data_dir / "k27.histo")
    assert {a: int(multi.histogram[a]) for a in range(1, 10001)} == expected
    # merged table must be globally sorted (ascending packed value)
    vals = [codec.words_to_value(row) for row in multi.kmers[:200]]
    assert vals == sorted(vals)


def test_multipass_per_bank(data_dir):
    files = ",".join(str(data_dir / f"c{i}.fasta.gz") for i in (1, 2))
    eng = CountEngine(27, batch_rows=256, row_len=128)
    multi = eng.count(files, per_bank=True, n_passes=2)
    single = eng.count(files, per_bank=True, n_passes=1)
    assert result_as_dict(multi) == result_as_dict(single)
    np.testing.assert_array_equal(
        multi.bank_counts.sum(axis=1), multi.counts.astype(np.int64)
    )


def test_dist_multipass(data_dir):
    from dsk_tpu.dist.engine import DistCountEngine

    uri = str(data_dir / "readN.fasta")
    eng = DistCountEngine(
        20, batch_rows=16, row_len=64, table_cap=1 << 10, n_passes=2
    )
    res = eng.count(uri)
    assert result_as_dict(res) == oracle.count_bank(uri, 20)


def test_planner_small_input_single_pass(data_dir):
    plan = plan_resources(
        str(data_dir / "read50x_ref10K_e001.fasta.gz"), 27, max_memory_mb=5000
    )
    assert plan.n_passes == 1
    assert plan.est_bases > 400_000  # ~500 kbases in the fixture


def test_planner_tight_memory_multi_pass(data_dir):
    # tiny memory budget must force several passes
    plan = plan_resources(
        str(data_dir / "read50x_ref10K_e001.fasta.gz"),
        27,
        max_memory_mb=1,
        sample=False,
        spill="off",  # this test pins the HBM pass ladder; spill mode
                      # satisfies tight memory with 1 pass instead
    )
    assert plan.n_passes > 1
    # capacity * passes must cover the (upper-bound) distinct estimate
    assert plan.table_cap * plan.n_passes >= plan.est_distinct
