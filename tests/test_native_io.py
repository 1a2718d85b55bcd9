"""Native C++ reader vs the Python parser: byte-identical batches."""

import gzip

import numpy as np
import pytest

from dsk_tpu.io import native
from dsk_tpu.io.bank import open_bank
from dsk_tpu.io.batch import batch_iterator

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdskio.so not built"
)


def collect(bank, k, rows, row_len, use_native):
    codes, bids = [], []
    bases = reads = 0
    for b in batch_iterator(bank, k, rows, row_len, use_native=use_native):
        codes.append(b.codes[: b.n_rows].copy())
        bids.append(b.bank_ids[: b.n_rows].copy())
        bases += b.n_bases
        reads += b.n_reads
    c = np.concatenate(codes) if codes else np.empty((0, row_len), np.uint8)
    i = np.concatenate(bids) if bids else np.empty((0,), np.int32)
    return c, i, bases, reads


def assert_same(uri, k, rows=64, row_len=128):
    bank = open_bank(uri)
    cn, bn, basn, rdn = collect(bank, k, rows, row_len, use_native=True)
    cp, bp, basp, rdp = collect(bank, k, rows, row_len, use_native=False)
    np.testing.assert_array_equal(cn, cp)
    np.testing.assert_array_equal(bn, bp)
    assert (basn, rdn) == (basp, rdp)


@pytest.mark.parametrize(
    "name,k",
    [
        ("readN.fasta", 20),
        ("longread.fasta", 27),
        ("read50x_ref10K_e001.fasta.gz", 27),
        ("shortread.fasta", 15),
        ("IUPAC.fasta", 15),
    ],
)
def test_native_matches_python_fixture(data_dir, name, k):
    assert_same(str(data_dir / name), k)


def test_native_composite_banks(data_dir):
    files = ",".join(str(data_dir / f"c{i}.fasta.gz") for i in range(1, 5))
    assert_same(files, 27, rows=37, row_len=96)  # odd batch size on purpose


def test_native_fastq_plain_and_gz(tmp_path, data_dir):
    # build a FASTQ (plain + gz) with multi-record content incl. N bases
    recs = [
        ("r1", "ACGTACGTACGTACGTNNACGT"),
        ("r2", "TTTTGGGGCCCCAAAATTTTGGGG"),
        ("r3", "ACT"),  # shorter than k -> skipped
        ("r4", "GATTACAGATTACAGATTACA"),
    ]
    fq = tmp_path / "t.fastq"
    with open(fq, "w") as f:
        for name, seq in recs:
            f.write(f"@{name} comment\n{seq}\n+\n{'I' * len(seq)}\n")
    fqgz = tmp_path / "t.fastq.gz"
    with gzip.open(fqgz, "wt") as f:
        for name, seq in recs:
            f.write(f"@{name} comment\n{seq}\n+\n{'I' * len(seq)}\n")
    assert_same(str(fq), 11, rows=4, row_len=16)
    assert_same(str(fqgz), 11, rows=4, row_len=16)


def test_native_multiline_fasta(tmp_path):
    fa = tmp_path / "m.fa"
    with open(fa, "w") as f:
        f.write(">a\nACGTACGT\nACGTTTTT\nGG\n>b desc\n" + "ACGT" * 50 + "\n")
    assert_same(str(fa), 13, rows=4, row_len=32)


def test_native_quality_line_with_at_sign(tmp_path):
    # quality lines may START with '@' — must not be parsed as a header
    fq = tmp_path / "q.fastq"
    with open(fq, "w") as f:
        f.write("@r1\nACGTACGTACGTACGT\n+\n@IIIIIIIIIIIIIII\n")
        f.write("@r2\nTTTTCCCCGGGGAAAA\n+\nIIIIIIIIIIIIIII@\n")
    assert_same(str(fq), 11, rows=4, row_len=32)


def test_native_end_to_end_count(data_dir):
    # the engine path with native IO reproduces the golden histogram
    from dsk_tpu.engine.counter import CountEngine
    from tests.conftest import load_histo_fixture

    res = CountEngine(27, batch_rows=512, row_len=128).count(
        str(data_dir / "read50x_ref10K_e001.fasta.gz")
    )
    expected = load_histo_fixture(data_dir / "k27.histo")
    assert {a: int(res.histogram[a]) for a in range(1, 10001)} == expected


def test_gz_pipe_matches_serial(data_dir, monkeypatch):
    """The threaded gz inflate pipe (producer thread + bounded chunk
    queue) must be byte-identical to the serial zlib path it overlaps
    (DSK_TPU_NO_GZ_PIPE=1 forces serial)."""
    from dsk_tpu.io import native

    if not native.available():
        pytest.skip("native reader not built")
    from dsk_tpu.io.bank import open_bank
    from dsk_tpu.io.batch import batch_iterator

    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")

    def collect():
        out = []
        for b in batch_iterator(open_bank(uri), 27, 64, 128):
            out.append((b.n_rows, b.n_bases, b.n_reads, b.codes.copy()))
        return out

    monkeypatch.setenv("DSK_TPU_NO_GZ_PIPE", "1")
    serial = collect()
    monkeypatch.delenv("DSK_TPU_NO_GZ_PIPE")
    piped = collect()
    assert len(serial) == len(piped)
    for (r1, b1, n1, c1), (r2, b2, n2, c2) in zip(serial, piped):
        assert (r1, b1, n1) == (r2, b2, n2)
        assert (c1 == c2).all()


def test_event_cap_closes_rows_early(tmp_path):
    """Reads with a few N's each: a wide row packs many of them, and
    without the soft invalid-event cap (io/batch.py ROW_EVENT_CAP,
    fastx.cpp EVENT_CAP) the row would exceed the exc wire format's
    exception slots.  Both parsers must close rows early, in lockstep,
    and every produced row must fit the wire budget."""
    from dsk_tpu.io.batch import ROW_EVENT_CAP
    from dsk_tpu.io.packed import pack_codes_exc_numpy

    # 48 bases, 2 in-read N's each: 16 reads would fit a 1024-wide row
    # with 15 separators + 32 N's = 47 events >> the cap of 16
    fa = tmp_path / "nsprinkle.fasta"
    with open(fa, "w") as fh:
        for i in range(64):
            fh.write(
                f">r{i}\nACGTACGTACGTACGTACGTN"
                f"ACGTACGTACGTN{'ACGTACGTACGTAC'[: 14]}\n"
            )
    bank = open_bank(str(fa))
    cn, bn, basn, rdn = collect(bank, 15, 32, 1024, use_native=True)
    cp, bp, basp, rdp = collect(bank, 15, 32, 1024, use_native=False)
    np.testing.assert_array_equal(cn, cp)
    assert (basn, rdn) == (basp, rdp)
    # the cap held: every row packs on the exc wire format
    live = cn <= 3
    L = cn.shape[1]
    last = np.where(live.any(1), L - np.argmax(live[:, ::-1], axis=1), 0)
    events = ((cn > 3) & (np.arange(L)[None, :] < last[:, None])).sum(1)
    assert events.max(initial=0) <= ROW_EVENT_CAP
    assert events.max(initial=0) > ROW_EVENT_CAP // 2  # the test bites
    pack_codes_exc_numpy(cn)  # must not raise WireOverflow
