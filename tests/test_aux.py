"""Aux subsystems: plots, multihost input sharding, sweep harness."""

import json
import subprocess
import sys

import numpy as np

from dsk_tpu.dist.multihost import shard_bank
from dsk_tpu.io.bank import open_bank
from dsk_tpu.utils import plots


def test_shard_bank_round_robin(data_dir):
    files = ",".join(str(data_dir / f"c{i}.fasta.gz") for i in range(1, 5))
    bank = open_bank(files)
    s0 = shard_bank(bank, process_id=0, num_processes=2)
    s1 = shard_bank(bank, process_id=1, num_processes=2)
    # gz members are atomic: every file lands on exactly one host, bank_id
    # stays the ORIGINAL index, and the global bank count is preserved
    units = sorted(
        (u.path, u.bank_id) for u in (s0.units + s1.units)
    )
    assert units == sorted((p, i) for i, p in enumerate(bank.files))
    assert s0.nb_banks == s1.nb_banks == 4
    assert all(u.start == 0 and u.end == -1 for u in s0.units + s1.units)


def test_plot_histo(data_dir, tmp_path):
    out = plots.plot_histo(
        str(data_dir / "k27.histo"), out=str(tmp_path / "h.png")
    )
    assert (tmp_path / "h.png").stat().st_size > 1000


def test_plot_histo2d(tmp_path):
    # synthesize a tiny histo2D matrix file
    path = tmp_path / "x.histo2D"
    with open(path, "w") as f:
        for r in range(1, 30):
            cols = [max(0, 100 - abs(r - 10) * 10)] + [max(0, 50 - abs(r - 12) * 7)] + [0] * 9
            f.write(f"{r} {' '.join(map(str, cols))}\n")
    out = plots.plot_histo2d(str(path), out=str(tmp_path / "h2.png"))
    assert (tmp_path / "h2.png").stat().st_size > 1000


def test_sweep_harness_smoke(data_dir, tmp_path):
    r = subprocess.run(
        [
            sys.executable, "scripts/sweep.py",
            str(data_dir / "readN.fasta"), "-k", "20",
            "--mems", "1000", "--passes", "1,2",
            "--batch-rows", "8", "--row-len", "64",
        ],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    cells = [json.loads(line) for line in r.stdout.splitlines() if line.strip()]
    assert len(cells) == 2
    assert all(c["status"] == "ok" for c in cells)
    assert cells[0]["n_distinct"] == cells[1]["n_distinct"]


def test_timeinfo_phases():
    import time as _t

    from dsk_tpu.utils.timeinfo import TimeInfo

    ti = TimeInfo()
    with ti.phase("a"):
        _t.sleep(0.01)
    with ti.phase("a"):
        _t.sleep(0.01)
    with ti.phase("b"):
        pass
    props = ti.as_properties()
    assert float(props["a"]) >= 0.02
    assert "b" in props


def test_progress_verbosity(capsys):
    import io as _io

    from dsk_tpu.utils.timeinfo import Progress

    buf = _io.StringIO()
    p = Progress(verbose=1, stream=buf)
    p.log("visible", 1)
    p.log("hidden", 2)
    assert "visible" in buf.getvalue()
    assert "hidden" not in buf.getvalue()


def test_trace_dir_writes_device_trace(tmp_path, data_dir):
    """-trace-dir captures a jax.profiler (xprof) trace of the count
    phase (SURVEY.md 5.1 device-side tracing)."""
    import os

    from dsk_tpu.engine.run import RunParams, execute

    trace = tmp_path / "trace"
    params = RunParams(
        file=str(data_dir / "shortread.fasta"),
        kmer_size=15,
        abundance_min=1,
        out=str(tmp_path / "out"),
        trace_dir=str(trace),
        verbose=0,
    )
    execute(params)
    files = [
        os.path.join(r, f) for r, _d, fs in os.walk(trace) for f in fs
    ]
    assert files, "no trace files written"
