"""Minimizer extraction + repartition vs a brute-force host oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from dsk_tpu.kmer import codec, minimizer
from dsk_tpu.io.bank import open_bank


def brute_minimizer(seq_codes: np.ndarray, k: int, m: int):
    """Oracle: for each window, min canonical m-mer (None if invalid)."""
    n = seq_codes.shape[0]
    out = []
    for i in range(n - k + 1):
        win = seq_codes[i : i + k]
        if (win > 3).any():
            out.append(None)
            continue
        best = None
        for j in range(k - m + 1):
            v = 0
            for c in win[j : j + m]:
                v = (v << 2) | int(c)
            v = codec.canonical_value(v, m)
            best = v if best is None or v < best else best
        out.append(best)
    return out


@pytest.mark.parametrize("k,m", [(11, 4), (21, 8), (27, 10), (16, 16)])
def test_window_minimizers_vs_brute(k, m):
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 5, size=(4, 64), dtype=np.uint8)
    codes[codes > 3] = 0xFF
    mins, valid = minimizer.window_minimizers(jnp.asarray(codes), k, m)
    mins, valid = np.asarray(mins), np.asarray(valid)
    for r in range(codes.shape[0]):
        expected = brute_minimizer(codes[r], k, m)
        for i, e in enumerate(expected):
            if e is None:
                assert not valid[r, i]
            else:
                assert valid[r, i]
                assert int(mins[r, i]) == e, (r, i)


def test_minimizer_strand_symmetry():
    # minimizer of a window == minimizer of its reverse complement
    rng = np.random.default_rng(1)
    k, m = 21, 7
    seq = rng.integers(0, 4, size=64, dtype=np.uint8)
    rc = (seq ^ 2)[::-1].copy()
    m1, v1 = minimizer.window_minimizers(jnp.asarray(seq[None, :]), k, m)
    m2, v2 = minimizer.window_minimizers(jnp.asarray(rc[None, :]), k, m)
    np.testing.assert_array_equal(np.asarray(m1)[0], np.asarray(m2)[0][::-1])


def test_superkmer_lengths_cover_all_windows():
    rng = np.random.default_rng(7)
    k, m = 21, 8
    codes = rng.integers(0, 4, size=(8, 128), dtype=np.uint8)
    mins, valid = minimizer.window_minimizers(jnp.asarray(codes), k, m)
    lens = minimizer.superkmer_lengths(np.asarray(mins), np.asarray(valid))
    assert lens.sum() == int(np.asarray(valid).sum())
    # compression: far fewer superkmers than windows
    assert lens.shape[0] < int(np.asarray(valid).sum())
    assert lens.mean() > 2


def test_repartition_balance(data_dir):
    bank = open_bank(str(data_dir / "read50x_ref10K_e001.fasta.gz"))
    freq = minimizer.sample_minimizer_frequencies(bank, 27, 8)
    assert freq.sum() > 0
    table = minimizer.build_repartition(freq, 16, frequency_aware=True)
    loads = np.zeros(16, dtype=np.int64)
    np.add.at(loads, table, freq)
    # frequency-aware balancing: max partition within 30% of mean
    mean = loads.mean()
    assert loads.max() <= mean * 1.3
    rr = minimizer.build_repartition(freq, 16, frequency_aware=False)
    assert rr.shape == table.shape
    assert set(np.unique(rr)) <= set(range(16))


def test_device_superkmer_segments_match_host():
    rng = np.random.default_rng(21)
    k, m = 21, 8
    codes = rng.integers(0, 5, size=(8, 128), dtype=np.uint8)
    codes[codes > 3] = 0xFF
    mins, valid = minimizer.window_minimizers(jnp.asarray(codes), k, m)
    is_head, head_len = minimizer.superkmer_segments(mins, valid)
    is_head, head_len = np.asarray(is_head), np.asarray(head_len)
    host_lens = minimizer.superkmer_lengths(np.asarray(mins), np.asarray(valid))
    dev_lens = head_len[is_head]
    # same multiset of run lengths, same total coverage
    assert sorted(dev_lens.tolist()) == sorted(host_lens.tolist())
    assert dev_lens.sum() == np.asarray(valid).sum()
    # every head has positive length; non-heads have zero
    assert (head_len[is_head] > 0).all()
    assert (head_len[~is_head] == 0).all()
