"""Fenced per-op costs at the big100 CLI config (table_cap 8.4M, G=8)
vs tighter tables — quantifies the planner's 2x distinct over-estimate
cost and flat-sort super-linearity at ~25M-row flushes.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from dsk_tpu.utils.hostmem import tune_malloc

tune_malloc()

import jax
import jax.numpy as jnp

from dsk_tpu.dist.engine import DistCountEngine


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.sum(leaf.ravel()[:1])))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 2 << 20, dtype=np.uint8)
    rows, L, G = 2048, 1024, 8
    reps = 4

    for cap in (1 << 23, 3 << 20, 1 << 21):
        eng = DistCountEngine(
            31, batch_rows=rows, row_len=L, buf_batches=G, table_cap=cap
        )
        t0 = time.perf_counter()
        eng.compile()
        print(f"[cap={cap/1e6:.1f}M] compiled in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        tab_p, tab_c, over, tover = eng._init_state()
        starts = rng.integers(0, genome.shape[0] - L, (G, rows))
        codes = np.stack(
            [np.stack([genome[s : s + L] for s in r]) for r in starts]
        )
        bids = np.zeros((G, rows), np.int32)
        dev = eng.mesh.devices.flat[0]
        b = jax.device_put(codes, dev)
        bi = jax.device_put(bids, dev)

        st = (tab_p, tab_c, over, tover)
        # warm + populate the table once
        st = eng._step(b, bi, *st, jnp.int32(0))
        fence(st)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = eng._step(b, bi, *st, jnp.int32(0))
        fence(st)
        per = (time.perf_counter() - t0) / reps
        mwin = G * rows * (L - 31 + 1) / 1e6
        print(
            f"[cap={cap/1e6:.1f}M] step(G={G}): {per*1e3:8.1f} ms/group "
            f"({mwin/per:.0f} Mwin/s) "
            f"sortrows/flush={(G*rows*(L-30)+cap)/1e6:.1f}M",
            flush=True,
        )

    # flat lax.sort scaling beyond 5M rows (3 operands, 2 keys)
    for n in (5 << 20, 10 << 20, 25 << 20):
        w0 = jnp.asarray(
            rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        )
        w1 = jnp.asarray(
            rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        )
        c = jnp.zeros(n, jnp.int32)
        f = jax.jit(lambda a, b, cc: jax.lax.sort((a, b, cc), num_keys=2))
        r = f(w0, w1, c)
        fence(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(r[0], r[1], r[2])
        fence(r)
        per = (time.perf_counter() - t0) / 3
        print(
            f"flat sort {n/1e6:.0f}M rows x3ops: {per*1e3:7.1f} ms "
            f"({per*1e9/n:.2f} ms/Mrow)",
            flush=True,
        )


if __name__ == "__main__":
    main()
