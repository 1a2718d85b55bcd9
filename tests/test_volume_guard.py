"""int32 occurrence-volume overflow guard (VERDICT r2 weak #1).

The flush accumulates per-chip run totals with an int32 cumsum whose
total equals ALL k-mer occurrences seen on that chip in the pass
(table counts + buffer weights).  Past 2^31 it silently wrapped before
round 3; these tests pin the device-side wrap guard at every flush
variant, the engine-level typed overflow, and the planner's
volume-aware pass constraint (the reference's own planning variable:
n_iters = ceil(v*b/D) from total volume v, doc/paper.tex:66-67).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsk_tpu.kmer.device import (
    SENTINEL,
    sum_by_key_planes_2d,
    sum_by_key_planes_capped,
    sum_by_key_presorted,
)

INT31 = 2**31


def _planes(keys: np.ndarray):
    return (jnp.asarray(keys, jnp.uint32),)


def test_capped_monolithic_wrap_flag():
    # 3 rows of weight 2^30 on one key: total 3*2^30 > 2^31 wraps
    keys = np.array([1, 1, 1, 5], np.uint32)
    weights = np.array([1 << 30, 1 << 30, 1 << 30, 7], np.int32)
    *_, n_lost, wrapped = sum_by_key_planes_capped(
        _planes(keys), jnp.asarray(weights), cap=4, segments=0
    )
    assert int(wrapped) == 1

    # same shape under the budget: no flag
    ok = np.array([1 << 29, 1 << 29, 1 << 29, 7], np.int32)
    *_, n_lost, wrapped = sum_by_key_planes_capped(
        _planes(keys), jnp.asarray(ok), cap=4, segments=0
    )
    assert int(wrapped) == 0


def test_capped_twostage_wrap_flag():
    rng = np.random.default_rng(0)
    N = 4096
    keys = rng.integers(0, 64, N).astype(np.uint32)
    weights = np.full(N, (INT31 // N) + 1, np.int32)  # sums past 2^31
    *_, wrapped = sum_by_key_planes_capped(
        _planes(keys), jnp.asarray(weights), cap=256, segments=4
    )
    assert int(wrapped) == 1
    *_, wrapped = sum_by_key_planes_capped(
        _planes(keys), jnp.asarray(np.ones(N, np.int32)), cap=256,
        segments=4,
    )
    assert int(wrapped) == 0


def test_2d_wrap_flag():
    # bucket row 1 wraps, row 0 does not
    keys = np.zeros((2, 8), np.uint32)
    keys[1, :] = 3
    weights = np.zeros((2, 8), np.int32)
    weights[0, :] = 1
    weights[1, :] = (INT31 // 8) + 1
    *_, wrapped = sum_by_key_planes_2d(
        (jnp.asarray(keys),), jnp.asarray(weights)
    )
    assert int(wrapped) == 1
    weights[1, :] = 1
    *_, wrapped = sum_by_key_planes_2d(
        (jnp.asarray(keys),), jnp.asarray(weights)
    )
    assert int(wrapped) == 0


def test_presorted_wrap_flag():
    a = (jnp.asarray([2, 4, SENTINEL, SENTINEL], jnp.uint32),)
    aw = jnp.asarray([INT31 - 10, 5, 0, 0], jnp.int32)
    b = (jnp.asarray([2, SENTINEL, SENTINEL, SENTINEL], jnp.uint32),)
    bw = jnp.asarray([100, 0, 0, 0], jnp.int32)
    *_, wrapped = sum_by_key_presorted(a, aw, b, bw)
    assert int(wrapped) == 1


def test_dist_engine_raises_count_volume_overflow(data_dir):
    """Seed a near-2^31 table (the crafted state VERDICT r2 asked for),
    stream one more flush group, and the typed overflow must fire."""
    from dsk_tpu.dist.engine import (
        AXIS,
        CountVolumeOverflow,
        DistCountEngine,
        Mesh,
    )
    from dsk_tpu.io.packed import pack_codes

    mesh = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    eng = DistCountEngine(
        15, mesh=mesh, batch_rows=16, row_len=64, table_cap=1 << 10,
        buf_batches=2, wire="bitmap",  # hand-packed bitmap groups below
    )
    plan = eng.plan

    # table state: one real kmer (value 0 = A^15) carrying almost 2^31
    tab_p = np.full((eng.WK, plan.table_cap), SENTINEL, np.uint32)
    tab_p[:, 0] = 0
    tab_c = np.zeros(plan.table_cap, np.int32)
    tab_c[0] = INT31 - 1000
    dev = mesh.devices.flat[0]
    tab_p = jax.device_put(tab_p, dev)
    tab_c = jax.device_put(tab_c, dev)
    over = jax.device_put(np.zeros(1, np.int32), dev)
    tover = jax.device_put(np.zeros(1, np.int32), dev)

    # one group of real batches (> 1000 windows pushes the cumsum over)
    rng = np.random.default_rng(1)
    G = plan.buf_batches
    ws, ms = [], []
    for _ in range(G):
        codes = rng.integers(0, 4, (16, 64), np.uint8)
        w, m = pack_codes(codes)
        ws.append(w)
        ms.append(m)
    bids = np.zeros((G, 16), np.int32)
    tab_p, tab_c, over, tover = eng._step(
        jax.device_put(np.stack(ws), dev),
        jax.device_put(np.stack(ms), dev),
        jax.device_put(bids, dev),
        tab_p, tab_c, over, tover, jnp.int32(0),
    )
    with pytest.raises(CountVolumeOverflow, match="occurrence-volume"):
        eng._check_overflow(over, tover)


def test_count_volume_overflow_is_table_overflow():
    # run.py's retry valve catches TableOverflow; the volume overflow
    # must ride the same handler (doubling n_passes is the right fix)
    from dsk_tpu.dist.engine import CountVolumeOverflow, TableOverflow

    assert issubclass(CountVolumeOverflow, TableOverflow)


def test_planner_volume_constraint():
    """plan_resources must plan passes from OCCURRENCE volume, not just
    the distinct estimate: 64 Gbases with a tiny distinct count still
    needs ceil(64e9 / 1.4e9) = 46 passes on one chip."""
    from dsk_tpu.engine import planner as pl

    class FakeBank:
        nb_banks = 1

        def estimate(self):
            return 64_000_000_000, 100  # bases, mean read len

    plan = pl.plan_resources(
        FakeBank(), 31, n_chips=1, sample=False, batch_rows=256,
        row_len=256, spill="off",  # pins the table path's volume bound
    )
    # distinct estimate upper-bounds at est_windows here (sample=False),
    # so distinct alone would already ask for passes; check the volume
    # bound explicitly dominates when distinct is small
    est_windows = 64_000_000_000 - (64_000_000_000 // 100) * 30
    want = -(-est_windows // pl.OCC_BUDGET_PER_CHIP_PASS)
    assert plan.n_passes >= want

    # 16 chips divide the volume
    plan16 = pl.plan_resources(
        FakeBank(), 31, n_chips=16, sample=False, batch_rows=256,
        row_len=256, spill="off",
    )
    assert plan16.n_passes >= -(-(est_windows // 16) // pl.OCC_BUDGET_PER_CHIP_PASS)
    assert plan16.n_passes < plan.n_passes


def test_simple_engine_host_guard():
    """CountEngine's conservative host-side bases guard (the simple
    engine has no device wrap flag)."""
    from dsk_tpu.dist.engine import CountVolumeOverflow
    from dsk_tpu.engine.counter import CountEngine
    from dsk_tpu.io.batch import Batch

    eng = CountEngine(15, batch_rows=4, row_len=32)
    codes = np.zeros((4, 32), np.uint8)

    def batches():
        # n_bases is metadata from the reader; claim a huge consumed-base
        # count to exercise the guard without streaming 2^31 bases
        yield Batch(codes, np.zeros(4, np.int32), 4, n_bases=2**31, n_reads=4)

    with pytest.raises(CountVolumeOverflow, match="occurrence-volume"):
        eng.count_stream(batches())
