"""Packed host->device wire format (io/packed.py): roundtrip exactness
and engine integration.  The reference packs its disk partitions to
2 bits/base (doc/paper.tex:104); here the pack/unpack pair guards the
TPU ingest boundary, so any bit-layout drift must break these tests."""

import numpy as np
import pytest

from dsk_tpu.io.batch import PAD
from dsk_tpu.io.packed import pack_codes, packed_shapes, unpack_codes_jnp


def canonical(codes: np.ndarray) -> np.ndarray:
    """What unpack must restore: every invalid byte becomes exactly PAD."""
    return np.where(codes <= 3, codes, PAD).astype(np.uint8)


@pytest.mark.parametrize("L", [16, 20, 32, 48, 96, 100, 128, 1024])
def test_roundtrip_exact(L):
    rng = np.random.default_rng(L)
    codes = rng.integers(0, 4, (7, L), dtype=np.uint8)
    # sprinkle invalids: separators, N-runs, row tails
    inv = rng.random((7, L)) < 0.15
    codes[inv] = PAD
    codes[3, :] = PAD                      # dead row
    codes[5, L // 2:] = PAD                # padded tail
    words, bitmap = pack_codes(codes)
    nw, nb = packed_shapes(L)
    assert words.shape == (7, nw) and words.dtype == np.uint32
    assert bitmap.shape == (7, nb) and bitmap.dtype == np.uint32
    out = np.asarray(unpack_codes_jnp(words, bitmap, L))
    np.testing.assert_array_equal(out, canonical(codes))


def test_roundtrip_under_jit_3d():
    import jax

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, (3, 4, 64), dtype=np.uint8)  # 4 = invalid
    codes[codes == 4] = PAD
    ws, bs = zip(*(pack_codes(codes[g]) for g in range(3)))
    words, bitmap = np.stack(ws), np.stack(bs)
    out = np.asarray(
        jax.jit(lambda w, b: unpack_codes_jnp(w, b, 64))(words, bitmap)
    )
    np.testing.assert_array_equal(
        out, np.stack([canonical(codes[g]) for g in range(3)])
    )


@pytest.mark.parametrize("L", [16, 48, 100, 128, 1024])
def test_native_packer_lockstep(L):
    from dsk_tpu.io import native
    from dsk_tpu.io.packed import pack_codes_numpy

    if not native.available():
        pytest.skip("libdskio.so unavailable")
    rng = np.random.default_rng(L + 1)
    codes = rng.integers(0, 4, (37, L), dtype=np.uint8)
    codes[rng.random((37, L)) < 0.1] = PAD
    wn, bn = native.pack_batch(codes)
    wp, bp = pack_codes_numpy(codes)
    np.testing.assert_array_equal(wn, wp)
    np.testing.assert_array_equal(bn, bp)


def test_wire_bytes_shrink():
    # the point of the format: <= 3 bits/base on the wire (+ alignment)
    words, bitmap = pack_codes(np.zeros((128, 1024), np.uint8))
    wire = words.nbytes + bitmap.nbytes
    assert wire * 8 <= 3 * 128 * 1024 + 128 * 32
    assert wire < (128 * 1024) // 2


def test_dist_engine_counts_through_packed_path():
    """End-to-end through DistCountEngine on the CPU mesh: the packed
    wire is the ONLY ingest path, so fixture parity elsewhere already
    covers it; this pins a tiny case with in-row separators directly."""
    from dsk_tpu import oracle
    from dsk_tpu.dist.engine import DistCountEngine, default_mesh
    from dsk_tpu.io.batch import Batch
    from dsk_tpu.kmer import codec

    rng = np.random.default_rng(7)
    k = 5
    letters = np.frombuffer(b"ACTG", np.uint8)  # A=0,C=1,T=2,G=3
    from collections import defaultdict

    rows = []
    want: dict[int, int] = defaultdict(int)
    for _ in range(16):
        a = rng.integers(0, 4, 40, dtype=np.uint8)
        b = rng.integers(0, 4, 25, dtype=np.uint8)
        row = np.full(96, PAD, np.uint8)
        row[:40] = a
        row[41:66] = b  # packed pair with one separator
        rows.append(row)
        oracle.count_sequence(want, letters[a].tobytes(), k)
        oracle.count_sequence(want, letters[b].tobytes(), k)
    codes = np.stack(rows)
    eng = DistCountEngine(
        k, mesh=default_mesh(), batch_rows=16, row_len=96,
        buf_batches=2, table_cap=1 << 11,
    )
    batch = Batch(codes, np.zeros(16, np.int32), 16)
    res = eng.count_stream(iter([batch]))
    got = {
        codec.words_to_value(row): int(c)
        for row, c in zip(res.kmers, res.counts)
    }
    assert got == want
