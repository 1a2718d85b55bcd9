#!/usr/bin/env python
"""Resource-sweep benchmark harness (the doc/figure-1 analog).

The reference's paper harness sweeps memory x disk and records
passes/partitions/time per cell, classifying crash modes
(doc/figure-1/process-log.py:14-19: out-of-memory, too-many-open-files,
disk-full).  This sweeps the TPU analogs — memory budget (table capacity
via the planner) and pass count — and records wallclock, throughput and
failure modes (table overflow / routing overflow).

Usage:
    python scripts/sweep.py tests/data/read50x_ref10K_e001.fasta.gz -k 27
    python scripts/sweep.py reads.fa -k 31 --mems 1,10,100 --passes 1,2,4
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from dsk_tpu.engine.counter import CountEngine
from dsk_tpu.engine.planner import plan_resources


def run_cell(uri: str, k: int, mem_mb: int, n_passes: int | None,
             batch_rows: int, row_len: int) -> dict:
    cell = {"mem_mb": mem_mb, "n_passes": n_passes}
    try:
        if n_passes is None:
            plan = plan_resources(uri, k, max_memory_mb=mem_mb,
                                  batch_rows=batch_rows, row_len=row_len)
            n_passes = plan.n_passes
            cell["n_passes"] = n_passes
            cell["planned"] = True
        eng = CountEngine(k, batch_rows=batch_rows, row_len=row_len)
        t0 = time.perf_counter()
        res = eng.count(uri, n_passes=n_passes)
        el = time.perf_counter() - t0
        cell.update(
            status="ok",
            wall_s=round(el, 2),
            mbases_per_s=round(res.info.get("n_bases", 0) / el / 1e6, 3),
            n_distinct=res.n_distinct,
        )
    except RuntimeError as e:  # overflow classifications
        msg = str(e)
        if "table overflow" in msg:
            cell.update(status="crashed (table overflow)")
        elif "routing overflow" in msg:
            cell.update(status="crashed (routing overflow)")
        else:
            cell.update(status=f"crashed ({msg[:60]})")
    except MemoryError:
        cell.update(status="crashed (out of memory)")
    return cell


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("file")
    p.add_argument("-k", type=int, default=27)
    p.add_argument("--mems", default="1,10,100,1000",
                   help="comma list of -max-memory MB cells")
    p.add_argument("--passes", default="",
                   help="explicit pass counts (default: planner decides)")
    p.add_argument("--batch-rows", type=int, default=512)
    p.add_argument("--row-len", type=int, default=128)
    args = p.parse_args()

    mems = [int(x) for x in args.mems.split(",") if x]
    passes = [int(x) for x in args.passes.split(",") if x] or [None]
    rows = []
    for mem in mems:
        for np_ in passes:
            cell = run_cell(args.file, args.k, mem, np_,
                            args.batch_rows, args.row_len)
            rows.append(cell)
            print(json.dumps(cell), flush=True)
    ok = [r for r in rows if r.get("status") == "ok"]
    if ok:
        best = max(ok, key=lambda r: r.get("mbases_per_s", 0))
        print(f"# best: {json.dumps(best)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
