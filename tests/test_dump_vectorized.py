"""Vectorized text-dump paths (VERDICT r3 weak #4).

The per-row python decode (codec.kmer_to_string over words_to_value)
runs ~100k rows/s — hours at reference-flagship table sizes
(utils/dsk2ascii.cpp:77-107 streams the same dump in C).  The chunked
numpy paths must be byte-identical to it.
"""

import io

import numpy as np
import pytest

from dsk_tpu.kmer import codec
from dsk_tpu.store import text as store_text


def _random_words(n, k, seed):
    rng = np.random.default_rng(seed)
    W = codec.words_per_kmer(k)
    vals = [
        int(rng.integers(0, 4))
        + (int(rng.integers(0, 1 << 62)) << 2) & ((1 << (2 * k)) - 1)
        for _ in range(n)
    ]
    words = np.stack([codec.value_to_words(v, k) for v in vals])
    return words, vals


@pytest.mark.parametrize("k", [15, 27, 31, 33, 63, 96, 127])
def test_words_to_letters_matches_scalar(k):
    words, vals = _random_words(64, k, seed=k)
    letters = codec.words_to_letters(words, k)
    assert letters.shape == (64, k)
    for i, v in enumerate(vals):
        assert letters[i].tobytes().decode() == codec.kmer_to_string(v, k)


def test_format_count_lines_matches_fstring():
    k = 27
    rng = np.random.default_rng(3)
    words, vals = _random_words(200, k, seed=5)
    # counts crossing every digit-length boundary incl. the int32 max
    counts = np.array(
        [1, 9, 10, 99, 100, 101, 2**31 - 1]
        + list(rng.integers(1, 2**31 - 1, size=193)),
        dtype=np.int64,
    )
    got = store_text.format_count_lines(
        codec.words_to_letters(words, k), counts
    )
    want = "".join(
        f"{codec.kmer_to_string(v, k)} {int(c)}\n"
        for v, c in zip(vals, counts)
    )
    assert got.decode() == want


def test_format_count_lines_empty():
    assert store_text.format_count_lines(
        np.empty((0, 5), np.uint8), np.empty((0,), np.int64)
    ) == b""


def test_dump_ascii_vectorized_matches_per_row(data_dir, tmp_path):
    """End-to-end: the chunk-vectorized plain dump equals the per-row
    decode of the same store, byte for byte."""
    from dsk_tpu.engine.run import RunParams, execute
    from dsk_tpu.store.hdf5 import OutputStore

    params = RunParams(
        file=str(data_dir / "read50x_ref10K_e001.fasta.gz"),
        kmer_size=27, abundance_min=1, out=str(tmp_path / "d"),
        verbose=0, batch_rows=256, row_len=128,
    )
    execute(params)
    with OutputStore.load(str(tmp_path / "d.h5")) as store:
        buf = io.BytesIO()
        n = store_text.dump_ascii(store, buf)
        k = store.kmer_size
        want = "".join(
            f"{codec.kmer_to_string(v, k)} {a}\n"
            for v, a in store.iter_items()
        )
        assert n == 93948
        assert buf.getvalue().decode() == want


def test_iter_sorted_rows_matches_heapq_merge(data_dir, tmp_path):
    """The vectorized k-way merge equals the per-row heapq merge on a
    multi-pass store (several sorted runs per partition)."""
    from dsk_tpu.engine.run import RunParams, execute
    from dsk_tpu.store.hdf5 import OutputStore

    params = RunParams(
        file=str(data_dir / "read50x_ref10K_e001.fasta.gz"),
        kmer_size=27, abundance_min=1, out=str(tmp_path / "m"),
        verbose=0, batch_rows=256, row_len=128, engine="dist",
    )
    execute(params)
    with OutputStore.load(str(tmp_path / "m.h5")) as store:
        want = list(store.iter_items_sorted())
        got = []
        for kk, cc in store.iter_sorted_rows(pool_rows=1 << 12):
            for row, c in zip(kk, cc):
                got.append((codec.words_to_value(row), int(c)))
        assert got == want
        vals = [v for v, _ in got]
        assert vals == sorted(vals)


def test_sorted_dump_with_bucketized_tables(data_dir, tmp_path):
    """flush_buckets > 1 gathers BUCKET-MAJOR tables (ascending only
    within each hash bucket); the store's run map must split appends at
    descents or the sorted merge emits out of order (latent round-3
    bug, fixed with _ascending_runs)."""
    from dsk_tpu.engine.run import RunParams, execute
    from dsk_tpu.store.hdf5 import OutputStore, _ascending_runs

    params = RunParams(
        file=str(data_dir / "read50x_ref10K_e001.fasta.gz"),
        kmer_size=27, abundance_min=1, out=str(tmp_path / "b"),
        verbose=0, batch_rows=256, row_len=128, engine="dist",
        flush_buckets=8,
    )
    execute(params)
    with OutputStore.load(str(tmp_path / "b.h5")) as store:
        # run maps hold >1 run per partition (bucket-major appends)
        solid = store._f["dsk/solid"]
        n_runs = sum(
            len(solid[p].attrs["run_sizes"]) for p in solid
        )
        assert n_runs > store.nb_partitions
        vals = []
        for kk, cc in store.iter_sorted_rows(pool_rows=1 << 12):
            for row in kk:
                vals.append(codec.words_to_value(row))
    assert vals == sorted(vals)
    assert len(vals) == 93948


def test_ascending_runs_unit():
    from dsk_tpu.store.hdf5 import _ascending_runs

    kk = np.array(
        [[0, 5], [0, 9], [1, 2], [0, 0], [2, 2], [1, 1]], np.uint32
    )
    assert _ascending_runs(kk, 2) == [3, 2, 1]
    assert _ascending_runs(kk[:1], 2) == [1]
    assert _ascending_runs(kk[:0], 2) == []
