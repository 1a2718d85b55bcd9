"""Bitonic merge primitive + the "merge" flush mode vs oracle/fixtures.

merge_sorted_planes / sum_by_key_presorted let the flush sort only the
new buffer and fold the (already sorted) persistent table in with an
elementwise merge network — the sortedness-exploiting analog of the
reference never re-sorting counted partition output (SURVEY.md C4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.dist.engine import DistCountEngine
from dsk_tpu.kmer import codec
from dsk_tpu.kmer.device import (
    SENTINEL,
    merge_sorted_planes,
    sum_by_key_planes,
    sum_by_key_presorted,
)
from tests.conftest import load_histo_fixture


def _make_sorted(rng, n, live, W, key_space=8):
    ks = rng.integers(0, key_space, (live, W)).astype(np.uint32)
    ks = ks[np.lexsort(ks.T[::-1])]
    full = np.full((n, W), SENTINEL, np.uint32)
    full[:live] = ks
    w = np.zeros(n, np.int32)
    w[:live] = rng.integers(1, 5, live)
    return full, w


@pytest.mark.parametrize("W", [1, 2, 4])
@pytest.mark.parametrize("sizes", [(1, 1), (7, 3), (64, 128), (300, 77)])
def test_merge_sorted_planes_matches_sort(W, sizes):
    rng = np.random.default_rng(W * 1000 + sizes[0])
    na, nb = sizes
    A, wa = _make_sorted(rng, na, rng.integers(0, na + 1), W)
    B, wb = _make_sorted(rng, nb, rng.integers(0, nb + 1), W)
    pa = tuple(jnp.asarray(A[:, w]) for w in range(W))
    pb = tuple(jnp.asarray(B[:, w]) for w in range(W))
    mp, mw = jax.jit(merge_sorted_planes)(pa, jnp.asarray(wa), pb, jnp.asarray(wb))
    merged = np.stack([np.asarray(x) for x in mp], 1)
    ref = np.concatenate([A, B])
    refw = np.concatenate([wa, wb])
    order = np.lexsort(ref.T[::-1])
    assert (merged == ref[order]).all()
    # weights travel with their keys (multiset per key)
    mw = np.asarray(mw)
    for key in np.unique(ref, axis=0):
        m = (ref == key).all(1)
        mm = (merged == key).all(1)
        assert sorted(refw[m].tolist()) == sorted(mw[mm].tolist())


@pytest.mark.parametrize("W", [1, 3])
def test_presorted_equals_plain_sum_by_key(W):
    rng = np.random.default_rng(7 * W)
    for na, nb in [(50, 20), (128, 128), (513, 40)]:
        A, wa = _make_sorted(rng, na, rng.integers(0, na + 1), W, key_space=16)
        B, wb = _make_sorted(rng, nb, rng.integers(0, nb + 1), W, key_space=16)
        pa = tuple(jnp.asarray(A[:, w]) for w in range(W))
        pb = tuple(jnp.asarray(B[:, w]) for w in range(W))
        u1, c1, n1, _w1 = jax.jit(sum_by_key_presorted)(
            pa, jnp.asarray(wa), pb, jnp.asarray(wb)
        )
        allp = tuple(jnp.concatenate([pa[w], pb[w]]) for w in range(W))
        u2, c2, n2 = jax.jit(sum_by_key_planes)(
            allp, jnp.asarray(np.concatenate([wa, wb]))
        )
        assert int(n1) == int(n2)
        for w in range(W):
            assert (np.asarray(u1[w]) == np.asarray(u2[w])).all()
        assert (np.asarray(c1) == np.asarray(c2)).all()


def result_as_dict(res):
    return {
        codec.words_to_value(row): int(a)
        for row, a in zip(res.kmers, res.counts)
    }


@pytest.mark.parametrize("k", [15, 33])
def test_merge_flush_vs_oracle_readN(data_dir, k):
    uri = str(data_dir / "readN.fasta")
    eng = DistCountEngine(
        k, batch_rows=16, row_len=64, table_cap=1 << 12, flush_mode="merge"
    )
    assert eng.flush_mode == "merge"
    res = eng.count(uri)
    assert result_as_dict(res) == oracle.count_bank(uri, k)


def test_merge_flush_k27_fixture(data_dir):
    uri = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = DistCountEngine(
        27, batch_rows=512, row_len=128, table_cap=1 << 15,
        flush_mode="merge",
    )
    res = eng.count(uri)
    expected = load_histo_fixture(data_dir / "k27.histo")
    got = {a: int(res.histogram[a]) for a in range(1, 10001)}
    assert got == expected
