"""Fenced device-ceiling measurement of the fused count step.

Feeds pre-staged device-resident packed groups to DistCountEngine._step
and times executions behind a real D2H fence — the device-side analog of
the reference's figure-1 sweep cells (doc/figure-1/run-dsk.sh), isolating
chip throughput from the harness tunnel's H2D wire (PERF.md
"wire-bound").  Usage:

    python scripts/measure_step.py [k ...]        # default: 31 63 96

Prints one line per k: step ms and Mbases/s device ceiling.  Needs the
persistent compile cache warm or ~1-3 min per cold program.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from dsk_tpu.utils.hostmem import tune_malloc

tune_malloc()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dsk_tpu.dist.engine import DistCountEngine, default_mesh  # noqa: E402
from dsk_tpu.io.packed import pack_codes  # noqa: E402

ROWS, L, G = 2304, 1024, 8


def fence(a):
    return float(np.asarray(jnp.sum(a.ravel()[:1].astype(jnp.float32))))


def measure(k: int, table_cap: int = 1 << 23, reps: int = 4) -> None:
    d = jax.devices()[0]
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 2 << 20, dtype=np.uint8)
    starts = rng.integers(0, genome.shape[0] - L, (G, ROWS))
    codes = np.stack(
        [np.stack([genome[s : s + L] for s in r]) for r in starts]
    ).astype(np.uint8)
    ws, ms = zip(*(pack_codes(codes[g]) for g in range(G)))
    words, bitmap = np.stack(ws), np.stack(ms)
    bids = np.zeros((G, ROWS), np.int32)

    eng = DistCountEngine(  # hand-packed bitmap groups below
        k, mesh=default_mesh(), batch_rows=ROWS, row_len=L,
        buf_batches=G, table_cap=table_cap, wire="bitmap",
    )
    t0 = time.perf_counter()
    eng.compile()
    print(f"[k={k}] compiled in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    tab_p, tab_c, over, tover = eng._init_state()
    cd = jax.device_put(words, d)
    md = jax.device_put(bitmap, d)
    bd = jax.device_put(bids, d)
    fence(cd)
    ps = jnp.int32(0)
    tab_p, tab_c, over, tover = eng._step(
        cd, md, bd, tab_p, tab_c, over, tover, ps
    )
    fence(over)  # first exec excluded
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        tab_p, tab_c, over, tover = eng._step(
            cd, md, bd, tab_p, tab_c, over, tover, ps
        )
        fence(over)
        ts.append(time.perf_counter() - t0)
    mb = G * ROWS * (L - k + 1) / 1e6  # valid windows ~ bases
    best = min(ts)
    print(
        f"k={k} W={eng.W}: step {best * 1e3:.0f} ms best "
        f"({np.median(ts) * 1e3:.0f} ms median) -> "
        f"{mb / best:.0f} Mbases/s device ceiling", flush=True,
    )


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [31, 63, 96]
    for k in ks:
        measure(k)
