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
