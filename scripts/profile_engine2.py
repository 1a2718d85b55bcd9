"""Direct fenced per-op costs of the engine's route and flush programs,
plus a scan-fused multi-batch route variant (dispatch-overhead probe).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dsk_tpu.dist.engine import DistCountEngine

K_REPS = 16


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.sum(leaf.ravel()[:1])))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 1 << 20, dtype=np.uint8)

    for rows, L in ((512, 1024), (2048, 1024)):
        eng = DistCountEngine(31, batch_rows=rows, row_len=L,
                              buf_batches=8, table_cap=1 << 21)
        t0 = time.perf_counter()
        eng.compile()
        print(f"[{rows}x{L}] compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        buf_p, buf_c, tab_p, tab_c, over, tover = eng._init_state()
        starts = rng.integers(0, genome.shape[0] - L, rows)
        codes = np.stack([genome[s : s + L] for s in starts])
        bids = np.zeros(rows, np.int32)
        dev = eng.mesh.devices.flat[0]
        b = jax.device_put(codes, dev)
        bi = jax.device_put(bids, dev)

        # route per-op (chained slots, no flush)
        state = (buf_p, buf_c, over)
        fence(state)
        t0 = time.perf_counter()
        for i in range(K_REPS):
            state = eng._route(b, bi, *state, jnp.int32(i % 8), jnp.int32(0))
        fence(state)
        per = (time.perf_counter() - t0 - 0.028) / K_REPS
        m = rows * (L - 31 + 1)
        print(f"[{rows}x{L}] route: {per*1e3:7.2f} ms/op "
              f"({m/per/1e6:.0f} Mwin/s)", flush=True)
        buf_p, buf_c, over = state

        # flush per-op (chained)
        st = (buf_p, buf_c, tab_p, tab_c, tover)
        fence(st)
        t0 = time.perf_counter()
        for _ in range(K_REPS):
            st = eng._flush(*st)
        fence(st)
        per = (time.perf_counter() - t0 - 0.028) / K_REPS
        print(f"[{rows}x{L}] flush: {per*1e3:7.2f} ms/op "
              f"(buf {eng.plan.buf_cap/1e6:.1f}M + tab "
              f"{eng.plan.table_cap/1e6:.1f}M rows)", flush=True)

        # empty dispatch floor: tiny jitted op chained
        tinyf = jax.jit(lambda x: x + 1)
        t = jax.device_put(np.zeros(8, np.int32), dev)
        fence(t)
        t0 = time.perf_counter()
        for _ in range(64):
            t = tinyf(t)
        fence(t)
        print(f"[{rows}x{L}] tiny-op chained: "
              f"{(time.perf_counter()-t0-0.028)/64*1e3:7.3f} ms/op",
              flush=True)


if __name__ == "__main__":
    main()
