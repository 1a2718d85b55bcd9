"""Does the axon tunnel multiplex PARALLEL H2D streams like D2H?

Round 2 found parallel D2H chunk downloads multiply tunnel bandwidth
(7.3 -> 35 MB/s with 8 threads).  The CLI count phase is H2D-wire-bound
(PERF.md), so if H2D multiplexes the same way, splitting each group's
device_put over worker threads lifts the end-to-end CLI throughput.

Protocol per CLAUDE.md: tiny put+fetch warmup FIRST (reverse-channel
flakiness), incompressible random payloads (the tunnel compresses
weakly but nonzero), every timing fenced by a 1-element D2H fetch of
each transferred array, best-of-2 windows reported by the caller.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    # warmup: tiny put + fetch (reverse channel setup)
    t0 = time.perf_counter()
    x = jax.device_put(np.ones(8, np.uint32), dev)
    _ = np.asarray(x[:1])
    log(f"warmup put+fetch: {time.perf_counter() - t0:.2f}s")

    rng = np.random.default_rng(0)
    CHUNK_MB = 8
    chunk_elems = CHUNK_MB * (1 << 20) // 4

    def put_one(arr):
        d = jax.device_put(arr, dev)
        # force the stream NOW (device_put is lazy through the tunnel)
        _ = np.asarray(d[:1])
        return d

    for n_streams in (8, 16, 32):
        chunks = [
            rng.integers(0, 2**32, chunk_elems, dtype=np.uint32)
            for _ in range(n_streams)
        ]
        total_mb = n_streams * CHUNK_MB
        for rep in range(2):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(n_streams) as ex:
                devs = list(ex.map(put_one, chunks))
            dt = time.perf_counter() - t0
            log(
                f"H2D {n_streams} streams x {CHUNK_MB} MB rep{rep}: "
                f"{dt:.2f}s = {total_mb / dt:.1f} MB/s"
            )
            del devs


if __name__ == "__main__":
    main()
