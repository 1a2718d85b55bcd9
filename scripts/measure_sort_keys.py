"""Fenced lax.sort sensitivity study on v5e: num_keys vs operand count
vs volume, at flush shapes.

Questions:
  1. Is the flush sort comparator-bound?  Same operands, fewer num_keys
     (prefix-keyed sort: dedup boundaries stay full-key, so exactness is
     preserved; see PERF.md).
  2. How super-linear is the flat sort?  10.1M vs 18.3M rows (one big
     flush group vs two small ones).

Protocol (CLAUDE.md): warmup put+fetch first, fenced timings, best-of-K.
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

    N_SMALL = 2048 * 994 * 4 + (1 << 21)   # 10.24M: one flush group + cap
    N_BIG = 2048 * 994 * 8 + (1 << 21)     # 18.4M: double group + cap

    def make(N, W):
        a = rng.integers(0, 2**32, (W + 1, N), dtype=np.uint32)
        a[-1] = 1  # weight payload
        return tuple(jax.device_put(np.ascontiguousarray(r), dev) for r in a)

    def sort_nk(nk):
        def f(*ops):
            return jax.lax.sort(ops, num_keys=nk)

        return f

    results = {}
    # W=2 flush shape: 3 operands
    args2 = make(N_SMALL, 2)
    results["W2-keys2-10M"] = bench("W2 10.2M 3ops keys=2", sort_nk(2), args2)
    results["W2-keys1-10M"] = bench("W2 10.2M 3ops keys=1", sort_nk(1), args2)
    del args2
    # W=4 flush shape: 5 operands
    args4 = make(N_SMALL, 4)
    results["W4-keys4-10M"] = bench("W4 10.2M 5ops keys=4", sort_nk(4), args4)
    results["W4-keys2-10M"] = bench("W4 10.2M 5ops keys=2", sort_nk(2), args4)
    results["W4-keys1-10M"] = bench("W4 10.2M 5ops keys=1", sort_nk(1), args4)
    del args4
    # volume scaling: is one 18.4M sort cheaper than two 10.2M sorts?
    argsb = make(N_BIG, 2)
    results["W2-keys2-18M"] = bench("W2 18.4M 3ops keys=2", sort_nk(2), argsb)
    del argsb
    # bandwidth floor: 2 operands, 1 key
    args1 = make(N_SMALL, 1)
    results["W1-keys1-10M"] = bench("W1 10.2M 2ops keys=1", sort_nk(1), args1)
    del args1

    log("== summary ==")
    for k, v in results.items():
        log(f"{k:16s} {v * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
