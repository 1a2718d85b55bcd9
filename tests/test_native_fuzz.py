"""Fuzz the native parser: malformed inputs must error or parse cleanly,
never crash the process (it's C++ writing into numpy buffers)."""

import gzip

import numpy as np
import pytest

from dsk_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdskio.so not built"
)


def drain(path, k=11, rows=8, row_len=32, max_batches=10000):
    r = native.NativeReader(str(path))
    total = 0
    try:
        for _ in range(max_batches):
            buf = np.full((rows, row_len), 0xFF, dtype=np.uint8)
            n, b, rd = r.next_batch(buf, k)
            if n == 0 and b == 0 and rd == 0:
                return total
            # rows must contain only valid codes or PAD
            assert ((buf[:n] <= 3) | (buf[:n] == 0xFF)).all()
            total += n
        raise AssertionError("parser did not terminate")
    finally:
        r.close()


def test_random_garbage_bytes(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(8):
        p = tmp_path / f"g{i}.fa"
        p.write_bytes(rng.integers(0, 256, size=2048, dtype=np.uint8).tobytes())
        try:
            drain(p)
        except ValueError:
            pass  # clean parse error is acceptable


def test_random_ascii_soup(tmp_path):
    rng = np.random.default_rng(1)
    chars = np.frombuffer(b">@+ACGTNacgtn\n\r\t xyz0123", dtype=np.uint8)
    for i in range(8):
        p = tmp_path / f"s{i}.fa"
        p.write_bytes(rng.choice(chars, size=4096).tobytes())
        try:
            drain(p)
        except ValueError:
            pass


def test_truncated_gzip(tmp_path):
    data = b">r\n" + b"ACGT" * 2000 + b"\n"
    full = gzip.compress(data)
    for cut in (10, len(full) // 2, len(full) - 3):
        p = tmp_path / f"t{cut}.fa.gz"
        p.write_bytes(full[:cut])
        try:
            drain(p)
        except ValueError:
            pass


def test_fastq_mismatched_quality_lengths(tmp_path):
    # quality shorter/longer than the sequence must not hang or crash
    p = tmp_path / "bad.fastq"
    p.write_text("@a\nACGTACGTACGTACGT\n+\nIII\n@b\nACGTACGTACGTACGT\n+\n"
                 + "I" * 40 + "\n@c\nACGTACGTACGTACGT\n+\n"
                 + "I" * 16 + "\n")
    try:
        drain(p)
    except (ValueError, AssertionError):
        pass


def test_no_trailing_newline(tmp_path):
    p = tmp_path / "nt.fa"
    p.write_bytes(b">a\nACGTACGTACGTACG")  # EOF mid-sequence
    assert drain(p, k=11) == 1  # the read still comes out


def test_huge_header_lines(tmp_path):
    p = tmp_path / "h.fa"
    p.write_bytes(b">" + b"x" * (5 << 20) + b"\nACGTACGTACGTACGT\n")
    assert drain(p, k=11) == 1
