"""Input edge cases: empty/degenerate files, CRLF, lowercase, giant reads."""

import gzip

import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.engine.counter import CountEngine
from dsk_tpu.io.bank import open_bank
from dsk_tpu.kmer import codec


def as_dict(res):
    return {codec.words_to_value(r): int(a) for r, a in zip(res.kmers, res.counts)}


def test_empty_sequences_and_header_only(tmp_path):
    f = tmp_path / "e.fa"
    f.write_text(">only_header\n>empty\n\n>real\nACGTACGTACGT\n")
    res = CountEngine(5, batch_rows=4, row_len=16).count(str(f))
    assert as_dict(res) == oracle.count_bank(str(f), 5)
    assert res.n_distinct > 0


def test_crlf_line_endings(tmp_path):
    f = tmp_path / "crlf.fa"
    f.write_bytes(b">a\r\nACGTACGTACGT\r\nGGGG\r\n>b\r\nTTTTCCCC\r\n")
    res = CountEngine(5, batch_rows=4, row_len=32).count(str(f))
    assert as_dict(res) == oracle.count_bank(str(f), 5)


def test_lowercase_bases(tmp_path):
    up = tmp_path / "u.fa"
    lo = tmp_path / "l.fa"
    up.write_text(">a\nACGTACGTACGTTTGGA\n")
    lo.write_text(">a\nacgtacgtacgtttgga\n")
    eng = CountEngine(7, batch_rows=2, row_len=32)
    assert as_dict(eng.count(str(up))) == as_dict(eng.count(str(lo)))


def test_single_giant_read_many_chunks(tmp_path):
    # one read far longer than row_len: halo chunking across dozens of rows
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    f = tmp_path / "g.fa"
    f.write_text(f">g\n{seq}\n")
    res = CountEngine(31, batch_rows=8, row_len=96).count(str(f))
    assert as_dict(res) == oracle.count_bank(str(f), 31)
    # mass conservation: every window counted exactly once despite halos
    assert int(res.counts.sum()) == 5000 - 31 + 1


def test_read_of_all_invalid(tmp_path):
    f = tmp_path / "n.fa"
    f.write_text(">n\nNNNNNNNNNNNNNNNN\n>ok\nACGTACGTACGT\n")
    res = CountEngine(6, batch_rows=4, row_len=20).count(str(f))
    assert as_dict(res) == oracle.count_bank(str(f), 6)


def test_gz_empty_file(tmp_path):
    f = tmp_path / "z.fa.gz"
    with gzip.open(f, "wt") as fh:
        fh.write("")
    # empty bank: zero distinct kmers, no crash
    res = CountEngine(7, batch_rows=2, row_len=16).count(str(f))
    assert res.n_distinct == 0


def test_mixed_album_fasta_fastq(tmp_path):
    fa = tmp_path / "a.fa"
    fa.write_text(">x\nACGTACGTACGTAAA\n")
    fq = tmp_path / "b.fastq"
    fq.write_text("@y\nACGTACGTACGTCCC\n+\nIIIIIIIIIIIIIII\n")
    album = tmp_path / "mixed_index"
    album.write_text(f"{fa}\n{fq}\n")
    bank = open_bank(str(album))
    assert bank.nb_banks == 2
    res = CountEngine(9, batch_rows=4, row_len=20).count(bank)
    assert as_dict(res) == oracle.count_bank(str(album), 9)


def test_gz_empty_file_python_path(tmp_path):
    # the python fallback parser must agree with native on empty inputs
    import gzip
    from dsk_tpu.io.batch import batch_iterator

    f = tmp_path / "z2.fa.gz"
    with gzip.open(f, "wt") as fh:
        fh.write("")
    bank = open_bank(str(f))
    assert list(batch_iterator(bank, 7, 2, 16, use_native=False)) == []
