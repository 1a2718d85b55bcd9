"""On-hardware golden gate (VERDICT r2 weak #4).

Counts tests/data/read50x_ref10K_e001.fasta.gz at k=27 through the DIST
engine ON THE REAL TPU CHIP (JAX_PLATFORMS=axon) and checks, in order:

1. the histogram byte-matches tests/data/k27.histo (the reference's
   simple_test.sh test 1 oracle, /root/reference/scripts/simple_test.sh:36);
2. the full downloaded (kmer, count) table equals the CPU oracle dict —
   93948 distinct kmers, value-exact.

Run: JAX_PLATFORMS=axon python scripts/tpu_golden.py
Exits 0 on parity, 1 on any mismatch; prints one JSON line.

Protocol per CLAUDE.md: tune_malloc first, tiny put+fetch warmup before
any real work (half of fresh processes hang on their first D2H
otherwise), persistent compile cache, progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# runnable as `python scripts/tpu_golden.py` from the repo root without
# PYTHONPATH: the package lives one directory up from this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"[tpu_golden] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    if dev.platform == "cpu":
        log("WARNING: running on CPU — this gates the TPU path; "
            "run under JAX_PLATFORMS=axon for the real artifact")

    # warmup: tiny put + fetch shakes out the reverse-channel flake
    t0 = time.perf_counter()
    x = jax.device_put(np.arange(8, dtype=np.int32), dev)
    assert int(np.asarray(x)[3]) == 3
    log(f"warmup put+fetch ok in {time.perf_counter() - t0:.1f}s")

    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    uri = os.path.join(root, "tests/data/read50x_ref10K_e001.fasta.gz")
    histo_path = os.path.join(root, "tests/data/k27.histo")
    k = 27

    from dsk_tpu.dist.engine import DistCountEngine, Mesh
    from dsk_tpu.io.bank import open_bank
    from dsk_tpu.io.batch import batch_iterator

    mesh = Mesh(np.array(jax.devices()[:1]), ("chips",))
    engine = DistCountEngine(
        k, mesh=mesh, batch_rows=512, row_len=128, table_cap=1 << 17,
        buf_batches=8,
    )
    engine.compile(progress=log)

    bank = open_bank(uri)
    t0 = time.perf_counter()
    res = engine.count_stream(
        batch_iterator(bank, k, 512, 128), nb_banks=1
    )
    t_count = time.perf_counter() - t0
    log(f"count_stream: {res.info['n_bases']} bases in {t_count:.1f}s")

    # gate 1: histogram vs the committed reference fixture
    want = {}
    with open(histo_path) as f:
        for line in f:  # fixture lists ALL bins 1..10000, zeros included
            a, c = line.split()
            if int(c) > 0:
                want[int(a)] = int(c)
    got = {
        i: int(c) for i, c in enumerate(res.histogram) if i > 0 and c > 0
    }
    histo_ok = got == want
    log(f"histogram vs k27.histo: {'MATCH' if histo_ok else 'MISMATCH'}")

    # gate 2: full table vs the CPU oracle (value-exact)
    from dsk_tpu import oracle
    from dsk_tpu.kmer import codec

    t0 = time.perf_counter()
    expect = oracle.count_bank(uri, k)
    log(f"cpu oracle: {len(expect)} distinct in {time.perf_counter()-t0:.1f}s")
    table = {
        codec.words_to_value(row): int(c)
        for row, c in zip(res.kmers, res.counts)
    }
    table_ok = table == expect
    log(f"table vs oracle: {'MATCH' if table_ok else 'MISMATCH'} "
        f"({len(table)} vs {len(expect)} kmers)")

    out = {
        "gate": "tpu_golden_read50x_k27_dist",
        "platform": dev.platform,
        "device": str(dev),
        "histo_match": histo_ok,
        "table_match": table_ok,
        "n_distinct": len(table),
        "count_s": round(t_count, 2),
    }
    print(json.dumps(out))
    return 0 if (histo_ok and table_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
