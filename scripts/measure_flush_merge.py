"""Fenced flush-variant shootout at bench shapes (one v5e chip).

Compares, per flush group (buffer 8.14M windows + table cap):

  A. flat     — sum_by_key_planes(concat(buf, tab))      [current default]
  B. merge    — lax.sort(buf) + bitonic-merge with the sorted table +
                dedup/compaction (sum_by_key_presorted)
  C. sized    — flat, with table_cap sized to distinct (1.25M vs 2M)
  D. (W=4)    — same A vs B at k=63 plane count

Protocol (CLAUDE.md): tiny put+fetch warmup first, every timing fenced
by a real 1-element D2H fetch, K reps best-of, persistent compile cache
on, stderr progress with flush.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dsk_tpu.kmer.device import (
        SENTINEL,
        sum_by_key_planes,
        sum_by_key_presorted,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    x = jax.device_put(np.ones(8, np.uint32), dev)
    _ = np.asarray(x[:1])
    log(f"warmup put+fetch {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    BUF = 2048 * 994 * 4  # bench geometry: 4 batches x 2048 rows x 994 wins
    DISTINCT = 1 << 20

    def make_inputs(W, cap, n_buf=BUF, n_distinct=DISTINCT):
        """Buffer = samples from a n_distinct pool (bench-like dup
        structure); table = the pool's first 60% (already counted),
        sorted, sentinel-padded to cap."""
        pool = rng.integers(0, 2**32, (n_distinct, W), dtype=np.uint32)
        pool[:, 0] &= (1 << 30) - 1  # word0 uses 2k-32*(W-1) bits
        pool = pool[np.lexsort(pool.T[::-1])]
        pool = np.unique(pool, axis=0)
        nd = pool.shape[0]
        idx = rng.integers(0, nd, n_buf)
        buf = pool[idx]
        bufw = np.ones(n_buf, np.int32)
        # ~2% dead rows (invalid windows)
        dead = rng.random(n_buf) < 0.02
        buf[dead] = 0xFFFFFFFF
        bufw[dead] = 0
        live_t = int(nd * 0.6)
        tab = np.full((cap, W), 0xFFFFFFFF, np.uint32)
        tab[:live_t] = pool[:live_t]
        tabw = np.zeros(cap, np.int32)
        tabw[:live_t] = rng.integers(1, 50, live_t)
        to_dev = lambda a: jax.device_put(a, dev)
        bp = tuple(to_dev(np.ascontiguousarray(buf[:, w])) for w in range(W))
        tp = tuple(to_dev(np.ascontiguousarray(tab[:, w])) for w in range(W))
        return bp, to_dev(bufw), tp, to_dev(tabw)

    def fence(arrs):
        return float(np.asarray(arrs[-1].ravel()[:1].astype(jnp.float32)))

    def bench(name, fn, args, K=5):
        fn_j = jax.jit(fn)
        t0 = time.perf_counter()
        out = fn_j(*args)
        fence(out)
        log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(K):
            t0 = time.perf_counter()
            out = fn_j(*args)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        log(f"  {name}: best {best * 1e3:.1f} ms")
        return best

    def flat(cap):
        def f(bp, bw, tp, tw):
            planes = tuple(
                jnp.concatenate([bp[w], tp[w]]) for w in range(len(bp))
            )
            weights = jnp.concatenate([bw, tw])
            uniq, counts, n_uniq = sum_by_key_planes(planes, weights)
            return tuple(u[:cap] for u in uniq) + (counts[:cap], n_uniq)

        return f

    def merge(cap):
        def f(bp, bw, tp, tw):
            W = len(bp)
            s = jax.lax.sort(bp + (bw,), num_keys=W)
            uniq, counts, n_uniq, _wrapped = sum_by_key_presorted(
                tuple(s[:W]), s[W], tp, tw
            )
            return tuple(u[:cap] for u in uniq) + (counts[:cap], n_uniq)

        return f

    results = {}
    for W, label in ((2, "k31"), (4, "k63")):
        for cap, caplab in ((1 << 21, "cap2M"), ((1 << 20) + (1 << 18), "cap1.25M")):
            log(f"[{label} {caplab}] building inputs (W={W})...")
            args = make_inputs(W, cap)
            key = f"{label}-{caplab}"
            results[f"flat-{key}"] = bench(f"flat  {key}", flat(cap), args)
            results[f"merge-{key}"] = bench(f"merge {key}", merge(cap), args)
            del args

    log("== summary ==")
    for k, v in sorted(results.items()):
        log(f"{k:24s} {v * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
