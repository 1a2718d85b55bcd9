"""Fenced phase profile of DistCountEngine on the real chip.

Splits streaming time into route(extract+append) vs flush by running the
same synthetic stream with flushes effectively disabled, then enabled.
Every timing ends with a 4-byte histogram-sum download (the only real
fence through the axon tunnel).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dsk_tpu.dist.engine import DistCountEngine
from dsk_tpu.io.batch import Batch

K = 31
ROWS, L = 512, 1024
N_BATCHES = 64


def synth_batches(n, seed=0):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 1 << 20, dtype=np.uint8)
    out = []
    for i in range(n):
        starts = rng.integers(0, genome.shape[0] - L, ROWS)
        codes = np.stack([genome[s : s + L] for s in starts])
        out.append(Batch(codes, np.zeros(ROWS, np.int32), ROWS, ROWS * L, ROWS))
    return out

def run(engine, batches, label):
    # warm
    res = engine.count_stream(iter(batches[:8]), finalize=False)
    t0 = time.perf_counter()
    res = engine.count_stream(iter(batches), finalize=False)
    dt = time.perf_counter() - t0
    bases = sum(b.n_bases for b in batches)
    print(f"{label:40s} {dt*1e3:8.1f} ms  {bases/dt/1e6:7.1f} Mbases/s",
          flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    batches = synth_batches(N_BATCHES)

    # flush every 8 batches (bench config)
    eng = DistCountEngine(K, batch_rows=ROWS, row_len=L, buf_batches=8,
                          table_cap=1 << 21)
    print("compiling flushing engine...", flush=True)
    t0 = time.perf_counter()
    eng.compile()
    print(f"  compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    t_flush = run(eng, batches, "route + flush every 8")

    # flushes disabled: buffer swallows the whole stream
    eng2 = DistCountEngine(K, batch_rows=ROWS, row_len=L,
                           buf_batches=N_BATCHES + 8, table_cap=1 << 21)
    print("compiling no-flush engine...", flush=True)
    t0 = time.perf_counter()
    eng2.compile()
    print(f"  compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    t_route = run(eng2, batches, "route only (one final flush)")

    n_flushes = N_BATCHES // 8
    bases = N_BATCHES * ROWS * L
    flush_ms = (t_flush - t_route) / n_flushes * 1e3
    print(f"\nper-flush cost ~{flush_ms:.1f} ms "
          f"({(t_flush-t_route)/t_flush*100:.0f}% of stream time); "
          f"route-only {bases/t_route/1e6:.1f} Mbases/s", flush=True)


if __name__ == "__main__":
    main()
