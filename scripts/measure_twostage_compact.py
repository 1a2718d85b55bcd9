"""Two-stage compaction experiment (pure XLA) at flush shapes.

The flush's 1-key compaction sort moves ALL N rows to compact <= cap run
heads to the front (the biggest flush piece: measure_flush_breakdown.py).
Batched VMEM-sized sorts are ~4x cheaper per row, and run heads are
uniformly spread over index space (key value does not correlate with
abundance), so:

  stage 1: reshape (S, N/S); batched 1-key sort per segment pushes each
           segment's keeps to its row front; slice rows to `slack` cols
           (keeps-per-segment > slack is COUNTED -> the engine's existing
           overflow/retry valve)
  stage 2: one small flat 1-key sort of S*slack rows restores global
           order by the carried global ckey

Compares against the monolithic compaction sort and the full
sum_by_key_planes, same process/window.
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

    from dsk_tpu.kmer.device import sum_by_key_planes

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    x = jax.device_put(np.ones(8, np.uint32), dev)
    _ = np.asarray(x[:1])
    log(f"warmup put+fetch {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    W = 2
    CAP = (1 << 20) + (1 << 19)
    BUF = 2048 * 994 * 8
    N = BUF + CAP  # 17.8M: the G8 flush shape
    # segment grid: N/S elements per segment
    S = 128
    L = -(-N // S)
    NP = S * L

    # duplicate structure like bench: ~1.05M distinct over the buffer
    pool = rng.integers(0, 2**32, (1 << 20, W), dtype=np.uint32)
    rows = pool[rng.integers(0, pool.shape[0], NP)]
    order = np.lexsort(rows.T[::-1])
    rows = rows[order]  # globally sorted, as after the flush's first sort
    wts = np.ones(NP, np.int32)

    sp = tuple(
        jax.device_put(np.ascontiguousarray(rows[:, w]), dev)
        for w in range(W)
    )
    wd = jax.device_put(wts, dev)

    def fence(arrs):
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
        return min(reps), out

    def keep_and_total(sk, sw):
        n = sk[0].shape[0]
        neq = jnp.zeros((n - 1,), jnp.bool_)
        for w in range(W):
            neq = neq | (sk[w][1:] != sk[w][:-1])
        is_new = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
        is_end = jnp.concatenate([neq, jnp.ones((1,), jnp.bool_)])
        csum = jnp.cumsum(sw)
        INT_MAX = jnp.int32(2**31 - 1)
        end_csum = jax.lax.cummin(
            jnp.where(is_end, csum, INT_MAX), axis=0, reverse=True
        )
        total = (end_csum - (csum - sw)).astype(jnp.int32)
        return is_new, total

    def mono(*a):
        """scans + monolithic 1-key compaction sort (current design)."""
        sk, sw = a[:W], a[W]
        keep, total = keep_and_total(sk, sw)
        idx = jnp.arange(NP, dtype=jnp.int32)
        ckey = jnp.where(keep, idx, NP)
        s2 = jax.lax.sort((ckey,) + sk + (total,), num_keys=1)
        return s2

    SLACK = 2 * -(-CAP // S)

    def twostage(*a):
        sk, sw = a[:W], a[W]
        keep, total = keep_and_total(sk, sw)
        idx = jnp.arange(NP, dtype=jnp.int32)
        ckey = jnp.where(keep, idx, NP)
        # stage 1: batched per-segment compaction
        ck2 = ckey.reshape(S, L)
        ops = (ck2,) + tuple(k.reshape(S, L) for k in sk) + (
            total.reshape(S, L),
        )
        s1 = jax.lax.sort(ops, num_keys=1, dimension=-1)
        n_keep_seg = jnp.sum(keep.reshape(S, L), axis=1)
        n_lost = jnp.sum(
            jnp.maximum(n_keep_seg - SLACK, 0)
        )  # -> overflow valve
        sl = tuple(o[:, :SLACK].reshape(S * SLACK) for o in s1)
        # stage 2: small flat sort restores global order
        s2 = jax.lax.sort(sl, num_keys=1)
        return s2 + (n_lost,)

    def full(*a):
        return sum_by_key_planes(a[:W], a[W])

    r_mono, out_m = bench("mono  scans+compact", mono, sp + (wd,))
    r_two, out_t = bench("2stage scans+compact", twostage, sp + (wd,))
    r_full, _ = bench("full sum_by_key (ref)", full, sp + (wd,))

    # parity: same compacted prefix
    m = np.asarray(out_m[1][:CAP])
    t = np.asarray(out_t[1][:CAP])
    lost = int(np.asarray(out_t[-1]))
    log(f"parity: prefix equal = {bool((m == t).all())}, lost = {lost}")
    log(
        f"== mono {r_mono * 1e3:.1f} ms  twostage {r_two * 1e3:.1f} ms "
        f"full {r_full * 1e3:.1f} ms =="
    )


if __name__ == "__main__":
    main()
