"""Two-level (batched + carry) scans vs flat cumsum/cummin at G32 flush
shapes.  Batched scans over VMEM-sized rows measured 6.8x cheaper per
row than flat ones (PERF.md); cumsum and (reverse) cummin are
associative, so a two-level decomposition over CONTIGUOUS (S, L)
segments with a carried prefix is exact:

  cumsum:  local cumsum per row + exclusive cumsum of row totals
  reverse cummin: local reverse cummin per row + inclusive-from-right
           cummin of row minima carried back in

Validates exact equality, then times flat vs two-level run-head + total
computation (_run_heads' scan half) at 66.8M rows.
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

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    x = jax.device_put(np.ones(8, np.uint32), dev)
    _ = np.asarray(x[:1])
    log(f"warmup put+fetch {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    N = 2048 * 994 * 32 + (1 << 20) + (1 << 19)  # 66.7M: G32 flush rows
    S = 1 << 10
    L = -(-N // S)
    NP = S * L

    w = rng.integers(0, 3, NP).astype(np.int32)
    wd = jax.device_put(w, dev)

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

    INT_MAX = np.int32(2**31 - 1)

    def flat(sw):
        csum = jnp.cumsum(sw)
        ends = jnp.where(sw > 1, csum, INT_MAX)  # stand-in end mask
        rmin = jax.lax.cummin(ends, axis=0, reverse=True)
        return csum, rmin

    def twolevel(sw):
        m = sw.reshape(S, L)
        local = jnp.cumsum(m, axis=1)
        carry = jnp.concatenate(
            [jnp.zeros((1,), sw.dtype), jnp.cumsum(local[:, -1])[:-1]]
        )
        csum = (local + carry[:, None]).reshape(NP)
        e = jnp.where(sw > 1, csum, INT_MAX).reshape(S, L)
        lmin = jax.lax.cummin(e, axis=1, reverse=True)
        rcarry = jax.lax.cummin(
            jnp.concatenate([lmin[1:, 0], jnp.full((1,), INT_MAX)]),
            axis=0, reverse=True,
        )
        rmin = jnp.minimum(lmin, rcarry[:, None]).reshape(NP)
        return csum, rmin

    tf, outf = bench("flat   cumsum+rcummin", flat, (wd,))
    t2, out2 = bench("2level cumsum+rcummin", twolevel, (wd,))

    a1, b1 = (np.asarray(o) for o in outf)
    a2, b2 = (np.asarray(o) for o in out2)
    log(f"equal: csum={(a1 == a2).all()}  rcummin={(b1 == b2).all()}")
    log(f"== flat {tf * 1e3:.1f} ms  two-level {t2 * 1e3:.1f} ms ==")


if __name__ == "__main__":
    main()
