"""On-hardware golden gates (VERDICT r2 weak #4, extended round 3).

Counts the reference's golden fixtures through the DIST engine ON THE
REAL TPU CHIP (JAX_PLATFORMS=axon) and diffs each against its committed
oracle — the same contract as /root/reference/scripts/simple_test.sh,
but executed on the hardware the framework targets:

  read50x  k=27  histogram vs k27.histo + full table vs the CPU oracle
                 (reference test 1, scripts/simple_test.sh:36)
  rlong    k=27  long/variable reads, histogram vs rlong.histo
                 (reference test 3, scripts/simple_test.sh:70)
  readN    k=20  split-at-N semantics, histogram vs readN.histo
                 (reference test 6, scripts/simple_test.sh:122)
  short    k=15  k == read length, exact text vs short.parse_results
                 (reference test 4, scripts/simple_test.sh:88)
  bigk     k=127 W=8 word planes vs the CPU oracle on a deterministic
                 synthetic bank (no reference fixture exists past k=32;
                 span dispatch parity, /root/reference/src/DSK.cpp:103)

Run: JAX_PLATFORMS=axon python scripts/tpu_golden.py [--gates a,b,...]
Exits 0 when every requested gate matches; prints one JSON line per
gate plus a summary line.

Protocol per CLAUDE.md: tune_malloc first, tiny put+fetch warmup before
any real work (half of fresh processes hang on their first D2H
otherwise), persistent compile cache, progress on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/tpu_golden.py` from the repo root without
# PYTHONPATH: the package lives one directory up from this file
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, "tests/data")


def log(msg: str) -> None:
    print(f"[tpu_golden] {msg}", file=sys.stderr, flush=True)


def load_histo(path: str) -> dict[int, int]:
    """Fixture -> {abundance: n_distinct}, zero bins dropped (fixtures
    list all 10,000 bins; count_stream histograms are dense arrays)."""
    want = {}
    with open(path) as f:
        for line in f:
            a, c = line.split()
            if int(c) > 0:
                want[int(a)] = int(c)
    return want


def histo_dict(histogram) -> dict[int, int]:
    return {i: int(c) for i, c in enumerate(histogram) if i > 0 and c > 0}


def synth_bigk_bank(path: str) -> None:
    """Deterministic synthetic FASTA for the k=127 gate: 24 reads x 600 bp
    over a fixed seed (mostly-distinct 127-mers exercise all 8 word
    planes through sort, dedup, and histogram)."""
    import numpy as np

    rng = np.random.default_rng(20260820)
    with open(path, "w") as f:
        genome = rng.integers(0, 4, size=6000, dtype=np.uint8)
        for i in range(24):
            start = int(rng.integers(0, 5400))
            codes = genome[start:start + 600]
            seq = "".join("ACTG"[c] for c in codes)
            f.write(f">r{i}\n{seq}\n")


def run_gate(name: str, jax, np, mesh, progress) -> dict:
    from dsk_tpu import oracle
    from dsk_tpu.dist.engine import DistCountEngine
    from dsk_tpu.io.bank import open_bank
    from dsk_tpu.io.batch import batch_iterator
    from dsk_tpu.kmer import codec

    spec = {
        # name: (uri, k, batch_rows, row_len, table_cap, histo fixture)
        "read50x": (os.path.join(DATA, "read50x_ref10K_e001.fasta.gz"),
                    27, 512, 128, 1 << 17, "k27.histo"),
        "rlong": (os.path.join(DATA, "longread.fasta"),
                  27, 256, 256, 1 << 17, "rlong.histo"),
        "readN": (os.path.join(DATA, "readN.fasta"),
                  20, 64, 128, 1 << 12, "readN.histo"),
        "short": (os.path.join(DATA, "shortread.fasta"),
                  15, 64, 128, 1 << 12, None),
        "bigk": (os.path.join("/tmp", "tpu_golden_bigk.fasta"),
                 127, 64, 640, 1 << 15, None),
    }[name]
    uri, k, batch_rows, row_len, table_cap, histo_fix = spec
    if name == "bigk":
        synth_bigk_bank(uri)

    engine = DistCountEngine(
        k, mesh=mesh, batch_rows=batch_rows, row_len=row_len,
        table_cap=table_cap, buf_batches=8,
    )
    t0 = time.perf_counter()
    engine.compile(progress=progress)
    t_compile = time.perf_counter() - t0

    bank = open_bank(uri)
    t0 = time.perf_counter()
    res = engine.count_stream(
        batch_iterator(bank, k, batch_rows, row_len), nb_banks=1
    )
    t_count = time.perf_counter() - t0
    log(f"{name}: {res.info['n_bases']} bases, k={k}, "
        f"compile {t_compile:.1f}s, count {t_count:.1f}s")

    checks = {}
    if histo_fix is not None:
        want = load_histo(os.path.join(DATA, histo_fix))
        checks["histo_match"] = histo_dict(res.histogram) == want

    # every gate: full table value-exact vs the trusted CPU oracle
    expect = oracle.count_bank(uri, k)
    table = {
        codec.words_to_value(row): int(c)
        for row, c in zip(res.kmers, res.counts)
    }
    checks["table_match"] = table == expect

    if name == "short":
        # reference test 4's exact text contract (short.parse_results);
        # both sides normalized the same way as test_oracle.py:57 (strip
        # + drop blank lines) so the check doesn't hinge on the fixture's
        # trailing-newline count (ADVICE r3)
        with open(os.path.join(DATA, "short.parse_results")) as f:
            want_lines = sorted(ln.strip() for ln in f if ln.strip())
        got_lines = sorted(
            f"{codec.kmer_to_string(v, k)} {c}" for v, c in table.items()
        )
        checks["text_match"] = got_lines == want_lines

    ok = all(checks.values())
    out = {
        "gate": f"tpu_golden_{name}_k{k}_dist",
        **checks,
        "n_distinct": len(table),
        "compile_s": round(t_compile, 2),
        "count_s": round(t_count, 2),
    }
    log(f"{name}: {'MATCH' if ok else 'MISMATCH'} {checks} "
        f"({len(table)} distinct)")
    return out


VALID_GATES = ("read50x", "rlong", "readN", "short", "bigk")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", default=",".join(VALID_GATES))
    args = ap.parse_args()

    gates = [g.strip() for g in args.gates.split(",") if g.strip()]
    unknown = [g for g in gates if g not in VALID_GATES]
    if unknown:  # fail early with a usable message, not a KeyError
        ap.error(
            f"unknown gate(s) {unknown}; valid: {', '.join(VALID_GATES)}"
        )

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

    from dsk_tpu.dist.engine import Mesh

    mesh = Mesh(np.array(jax.devices()[:1]), ("chips",))

    results = []
    for name in gates:
        results.append(run_gate(name, jax, np, mesh, log))
        print(json.dumps(results[-1]), flush=True)

    all_ok = all(
        all(v for kk, v in r.items() if kk.endswith("_match"))
        for r in results
    )
    print(json.dumps({
        "gate": "tpu_golden_summary",
        "platform": dev.platform,
        "device": str(dev),
        "gates": len(results),
        "all_match": all_ok,
    }))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
