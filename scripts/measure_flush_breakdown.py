"""Fenced breakdown of the flat flush at production shapes (one v5e).

Pieces, each jitted separately over the same inputs (13.8M rows = 12.3M
buffer + 1.5M table, W=2 and W=4):

  sort3      — lax.sort(keys + weight), num_keys=W      [flush sort]
  sort2      — lax.sort(keys only)                      [weight-derived variant]
  scans      — run-boundary + cumsum/cummin run totals  [dedup scans]
  compact    — the 1-key compaction sort (ckey + keys + total)
  full       — sum_by_key_planes (sanity: ~= sort3 + scans + compact)

This decides where a Pallas kernel (merge / stream-compaction) can
actually pay: PERF.md round-2-final shows the sort is bandwidth-bound
and XLA-level alternatives are exhausted.

Protocol (CLAUDE.md): warmup put+fetch, per-rep times printed (weather
check), best-of-K.
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

    from dsk_tpu.kmer.device import SENTINEL, _dedup_sorted, sum_by_key_planes

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    x = jax.device_put(np.ones(8, np.uint32), dev)
    _ = np.asarray(x[:1])
    log(f"warmup put+fetch {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    BUF = 2048 * 994 * 6  # G8 group minus ~2 batches of dups deduped: 12.2M
    CAP = (1 << 20) + (1 << 19)
    N = BUF + CAP

    def fence(arrs):
        if not isinstance(arrs, (tuple, list)):
            arrs = (arrs,)
        leaf = jax.tree_util.tree_leaves(arrs)[-1]
        return float(np.asarray(leaf.ravel()[:1].astype(jnp.float32)))

    def bench(name, fn, args, K=5):
        fn_j = jax.jit(fn)
        t0 = time.perf_counter()
        out = fn_j(*args)
        fence(out)
        log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s")
        reps = []
        for _ in range(K):
            t0 = time.perf_counter()
            out = fn_j(*args)
            fence(out)
            reps.append(time.perf_counter() - t0)
        log(
            f"  {name}: best {min(reps) * 1e3:.1f} ms  "
            f"(reps {' '.join(f'{r * 1e3:.0f}' for r in reps)})"
        )
        return min(reps)

    for W in (2, 4):
        log(f"[W={W}] building inputs ({N / 1e6:.1f}M rows)...")
        keys = rng.integers(0, 2**32, (W, N), dtype=np.uint32)
        keys[0] &= (1 << 30) - 1
        wts = np.ones(N, np.int32)
        dead = rng.random(N) < 0.02
        for w in range(W):
            keys[w][dead] = 0xFFFFFFFF
        wts[dead] = 0
        kp = tuple(jax.device_put(np.ascontiguousarray(keys[w]), dev) for w in range(W))
        wd = jax.device_put(wts, dev)
        # a pre-sorted copy for the scans/compact pieces
        skeys = keys[:, np.lexsort(keys[::-1])]
        sp = tuple(
            jax.device_put(np.ascontiguousarray(skeys[w]), dev) for w in range(W)
        )

        r = {}
        r["sort3"] = bench(
            f"W{W} sort keys+wt",
            lambda *a: jax.lax.sort(a, num_keys=W),
            kp + (wd,),
        )
        r["sort2"] = bench(
            f"W{W} sort keys-only",
            lambda *a: jax.lax.sort(a, num_keys=W),
            kp,
        )

        def scans(*a):
            sk, sw = a[:W], a[W]
            neq = jnp.zeros((N - 1,), jnp.bool_)
            for w in range(W):
                neq = neq | (sk[w][1:] != sk[w][:-1])
            is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
            is_end = jnp.concatenate([neq, jnp.ones((1,), jnp.bool_)])
            csum = jnp.cumsum(sw)
            INT_MAX = jnp.int32(2**31 - 1)
            end_csum = jax.lax.cummin(
                jnp.where(is_end, csum, INT_MAX), axis=0, reverse=True
            )
            run_total = (end_csum - (csum - sw)).astype(jnp.int32)
            return is_new, run_total

        r["scans"] = bench(f"W{W} dedup scans", scans, sp + (wd,))

        def compact(*a):
            sk, tot = a[:W], a[W]
            keep = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), sk[0][1:] != sk[0][:-1]]
            )
            idx = jnp.arange(N, dtype=jnp.int32)
            ckey = jnp.where(keep, idx, N)
            return jax.lax.sort((ckey,) + sk + (tot,), num_keys=1)

        r["compact"] = bench(
            f"W{W} compaction sort", compact, sp + (wd,)
        )
        r["full"] = bench(
            f"W{W} full sum_by_key", lambda *a: sum_by_key_planes(a[:W], a[W]),
            kp + (wd,),
        )
        log(
            f"[W={W}] sum of pieces {1e3 * (r['sort3'] + r['scans'] + r['compact']):.1f}"
            f" ms vs full {1e3 * r['full']:.1f} ms"
        )
        del kp, wd, sp


if __name__ == "__main__":
    main()
