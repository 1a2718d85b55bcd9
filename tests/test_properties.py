"""Property tests: counting invariances the reference pins via fixtures
(SURVEY.md section 4.5) plus generated-input oracle checks."""

import gzip

import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.engine.counter import CountEngine
from dsk_tpu.kmer import codec
from dsk_tpu.utils import sysinfo


def write_fasta(path, seqs, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")


ALPHA = "ACGT"


def random_seqs(rng, n, lo, hi, with_invalid=0.0):
    out = []
    for _ in range(n):
        ln = int(rng.integers(lo, hi + 1))
        chars = rng.choice(list(ALPHA), size=ln)
        if with_invalid:
            bad = rng.random(ln) < with_invalid
            chars[bad] = "N"
        out.append("".join(chars))
    return out


def as_dict(res):
    return {codec.words_to_value(r): int(a) for r, a in zip(res.kmers, res.counts)}


def test_count_invariant_to_file_sharding(tmp_path):
    # count(whole) == count(shards as comma list) — the c1..c4 property
    rng = np.random.default_rng(3)
    seqs = random_seqs(rng, 60, 40, 200, with_invalid=0.02)
    whole = tmp_path / "w.fa"
    write_fasta(whole, seqs)
    shards = []
    for i in range(4):
        p = tmp_path / f"s{i}.fa.gz"
        write_fasta(p, seqs[i * 15 : (i + 1) * 15], gz=True)
        shards.append(str(p))
    eng = CountEngine(21, batch_rows=32, row_len=96)
    a = eng.count(str(whole))
    b = eng.count(",".join(shards))
    assert as_dict(a) == as_dict(b)
    np.testing.assert_array_equal(a.histogram, b.histogram)


def test_count_invariant_to_read_order(tmp_path):
    rng = np.random.default_rng(4)
    seqs = random_seqs(rng, 40, 30, 120)
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    write_fasta(f1, seqs)
    write_fasta(f2, seqs[::-1])
    eng = CountEngine(19, batch_rows=16, row_len=64)
    assert as_dict(eng.count(str(f1))) == as_dict(eng.count(str(f2)))


def test_count_matches_strand_flip(tmp_path):
    # canonical counting: reverse-complementing every read changes nothing
    rng = np.random.default_rng(5)
    seqs = random_seqs(rng, 30, 50, 150)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = ["".join(comp[c] for c in reversed(s)) for s in seqs]
    f1 = tmp_path / "f.fa"
    f2 = tmp_path / "r.fa"
    write_fasta(f1, seqs)
    write_fasta(f2, rc)
    eng = CountEngine(23, batch_rows=16, row_len=160)
    assert as_dict(eng.count(str(f1))) == as_dict(eng.count(str(f2)))


@pytest.mark.parametrize("k", [9, 21, 33])
def test_random_inputs_vs_oracle(tmp_path, k):
    rng = np.random.default_rng(k)
    seqs = random_seqs(rng, 25, k, 5 * k, with_invalid=0.05)
    f = tmp_path / "x.fa"
    write_fasta(f, seqs)
    eng = CountEngine(k, batch_rows=8, row_len=2 * k)
    assert as_dict(eng.count(str(f))) == oracle.count_bank(str(f), k)


def test_total_abundance_equals_window_count(tmp_path):
    # sum of abundances == number of valid windows (mass conservation)
    rng = np.random.default_rng(9)
    seqs = random_seqs(rng, 20, 40, 100, with_invalid=0.03)
    f = tmp_path / "m.fa"
    write_fasta(f, seqs)
    k = 17
    res = CountEngine(k, batch_rows=8, row_len=64).count(str(f))
    expected_windows = sum(
        int(ok.sum())
        for ok in (
            codec.canonical_windows(codec.encode_bytes(s.encode()), k)[1]
            for s in seqs
            if len(s) >= k
        )
    )
    assert int(res.counts.sum()) == expected_windows


def test_sysinfo_probes():
    assert sysinfo.total_ram_mb() > 100
    assert sysinfo.free_disk_mb("/tmp") > 0
    assert sysinfo.n_cores() >= 1
    lim = sysinfo.auto_limits()
    assert lim["max_memory_mb"] > 0
