"""Overflow auto-retry valve + mesh-aware planner sizing.

The reference auto-picks n_iters from its resource budget
(/root/reference/doc/paper.tex:66); dsk_tpu must re-plan and re-run on
capacity overflow instead of telling the user to hand-tune (VERDICT r1).
"""

import numpy as np
import pytest

from dsk_tpu.dist.engine import DistCountEngine, TableOverflow
from dsk_tpu.engine import run as run_mod
from dsk_tpu.engine.planner import ResourcePlan, plan_resources
from dsk_tpu.engine.run import RunParams, execute
from tests.conftest import load_histo_fixture


def test_planner_is_mesh_aware(data_dir):
    f = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    p1 = plan_resources(f, 27, max_memory_mb=4000, n_chips=1, sample=False)
    p8 = plan_resources(f, 27, max_memory_mb=4000, n_chips=8, sample=False)
    # per-chip table shrinks with the mesh (powers of two: expect >= 4x)
    assert p8.table_cap <= p1.table_cap // 4


def test_table_overflow_raises_typed(data_dir):
    f = str(data_dir / "read50x_ref10K_e001.fasta.gz")
    eng = DistCountEngine(27, batch_rows=256, row_len=128, table_cap=1 << 10)
    with pytest.raises(TableOverflow):
        eng.count(f)


def test_execute_retries_table_overflow(data_dir, tmp_path, monkeypatch):
    """A plan whose table_cap is far too small must still produce the
    correct histogram via the pass-doubling retry valve."""
    f = str(data_dir / "read50x_ref10K_e001.fasta.gz")

    tiny = ResourcePlan(
        n_passes=1,
        table_cap=1 << 12,  # 8 chips x 4k slots for ~110k distinct: overflows
        flush_items=1 << 18,
        buf_batches=8,
        batch_rows=256,
        row_len=128,
        est_bases=500_000,
        est_distinct=1 << 12,
        est_distinct_per_pass=1 << 12,
    )
    monkeypatch.setattr(run_mod, "plan_resources", lambda *a, **kw: tiny)

    params = RunParams(
        file=f,
        kmer_size=27,
        abundance_min=1,
        out=str(tmp_path / "r"),
        histo=True,
        engine="dist",
        batch_rows=256,
        row_len=128,
        verbose=0,
        checkpoint=False,
    )
    out = execute(params)
    got = {
        i: int(c)
        for i, c in enumerate(out.result.histogram)
        if c and i > 0
    }
    want = {
        a: c for a, c in load_histo_fixture(data_dir / "k27.histo").items()
        if c
    }
    assert got == want
    assert out.result.info.get("n_passes", 1) >= 2  # the valve actually fired


def test_execute_falls_back_to_bitmap_wire_on_n_dense_input(
    tmp_path, monkeypatch
):
    """N-dense reads exceed the sparse exc wire format's per-row
    exception budget (io/packed.py EXC_E): the packer raises the typed
    WireOverflow and the valve must re-stream on the dense bitmap
    format with no count change."""
    from collections import defaultdict

    from dsk_tpu import oracle

    k = 7
    # period-6 N pattern: a 128-wide packed row carries ~21 in-read
    # invalid events > EXC_E=16; the 30-base head yields real kmers
    read = "ACGTACGTACGTACGTACGTACGTACGTAC" + "NACGTA" * 30
    fa = tmp_path / "ndense.fasta"
    with open(fa, "w") as fh:
        for i in range(40):
            fh.write(f">r{i}\n{read}\n")

    wires = []
    orig = run_mod._select_engine

    def recording(*a, **kw):
        wires.append(kw.get("wire"))
        return orig(*a, **kw)

    monkeypatch.setattr(run_mod, "_select_engine", recording)

    params = RunParams(
        file=str(fa),
        kmer_size=k,
        abundance_min=1,
        out=str(tmp_path / "r"),
        histo=True,
        engine="dist",
        verbose=0,
        checkpoint=False,
    )
    out = execute(params)
    assert wires[0] is None          # first attempt: engine default (exc)
    assert wires[-1] == "bitmap"     # the wire valve actually fired

    want: dict[int, int] = defaultdict(int)
    oracle.count_sequence(want, read.encode(), k)
    for kk in want:
        want[kk] *= 40
    hist: dict[int, int] = defaultdict(int)
    for c in want.values():
        hist[c] += 1
    got = {
        i: int(c)
        for i, c in enumerate(out.result.histogram)
        if c and i > 0
    }
    assert got == dict(hist)


def test_pinned_exc_wire_fails_loudly_on_n_dense_input(
    tmp_path, monkeypatch
):
    """An explicit -wire exc pin must NOT be silently demoted to bitmap
    by the fallback valve (it would corrupt a format benchmark): the
    run fails with a clear WireOverflow instead."""
    from dsk_tpu.io.packed import WireOverflow

    read = "ACGTACGTACGTACGTACGTACGTACGTAC" + "NACGTA" * 30
    fa = tmp_path / "ndense2.fasta"
    with open(fa, "w") as fh:
        for i in range(10):
            fh.write(f">r{i}\n{read}\n")
    params = RunParams(
        file=str(fa), kmer_size=7, abundance_min=1,
        out=str(tmp_path / "p"), engine="dist", verbose=0,
        checkpoint=False, wire="exc",
    )
    with pytest.raises(WireOverflow, match="pinned"):
        execute(params)
