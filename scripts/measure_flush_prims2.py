"""Round 2 of flush-primitive measurement: amortize the ~25 ms axon RPC
floor by looping each op inside one jitted program (lax.fori_loop with a
data dependency; lax.sort is a data-oblivious network so feeding sorted
data back does not bias the cost).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

REPS = 10


def bench(name, body, args, reps=REPS):
    """body: carry -> carry (one op application). Times reps in-program."""

    def looped(c):
        return jax.lax.fori_loop(0, reps, lambda i, cc: body(cc), c)

    fn = jax.jit(looped)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(args))
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.025) / reps  # subtract the RPC floor once
    print(f"{name:48s} {per*1e3:9.3f} ms/op  (compile {compile_s:.1f}s)",
          flush=True)
    return per


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)

    N = 5 << 20
    M = 512 * 994
    S = 256

    p0 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    p1 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    wts = jnp.asarray(rng.integers(0, 3, N, dtype=np.int32))

    bench("flat lax.sort 5M keys=2 +1 payload",
          lambda c: tuple(jax.lax.sort(c, num_keys=2)), (p0, p1, wts))
    R = N // S
    bench(f"batched lax.sort ({S},{R}) keys=2 +1 payload",
          lambda c: tuple(jax.lax.sort(c, num_keys=2, dimension=-1)),
          (p0.reshape(S, R), p1.reshape(S, R), wts.reshape(S, R)))
    S2 = 1024
    bench(f"batched lax.sort ({S2},{N//S2}) keys=2 +1 payload",
          lambda c: tuple(jax.lax.sort(c, num_keys=2, dimension=-1)),
          (p0.reshape(S2, N//S2), p1.reshape(S2, N//S2),
           wts.reshape(S2, N//S2)))
    S4 = 4096
    bench(f"batched lax.sort ({S4},{N//S4}) keys=2 +1 payload",
          lambda c: tuple(jax.lax.sort(c, num_keys=2, dimension=-1)),
          (p0.reshape(S4, N//S4), p1.reshape(S4, N//S4),
           wts.reshape(S4, N//S4)))

    def scans2d(c):
        a, b, w = c
        neq = (a[:, 1:] != a[:, :-1]) | (b[:, 1:] != b[:, :-1])
        is_end = jnp.concatenate(
            [neq, jnp.ones((a.shape[0], 1), jnp.bool_)], axis=1)
        csum = jnp.cumsum(w, axis=1)
        INT_MAX = jnp.int32(2**31 - 1)
        end_csum = jax.lax.cummin(
            jnp.where(is_end, csum, INT_MAX), axis=1, reverse=True)
        rt = end_csum - (csum - w)
        return a, b, rt
    bench(f"batched scans ({S},{R})", scans2d,
          (p0.reshape(S, R), p1.reshape(S, R), wts.reshape(S, R)))

    def scans1d(c):
        a, b, w = c
        neq = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        is_end = jnp.concatenate([neq, jnp.ones((1,), jnp.bool_)])
        csum = jnp.cumsum(w)
        INT_MAX = jnp.int32(2**31 - 1)
        end_csum = jax.lax.cummin(
            jnp.where(is_end, csum, INT_MAX), axis=0, reverse=True)
        return a, b, (end_csum - (csum - w))
    bench("flat scans 5M", scans1d, (p0, p1, wts))

    h = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    q0, q1 = p0[:M], p1[:M]
    qw = wts[:M]
    bench("per-batch lax.sort 509k keys=1 +3 payload",
          lambda c: tuple(jax.lax.sort(c, num_keys=1)), (h, q0, q1, qw))
    bench("per-batch lax.sort 509k keys=3 +1 payload",
          lambda c: tuple(jax.lax.sort(c, num_keys=3)), (h, q0, q1, qw))

    C = int(M / S * 2)
    buckets = jnp.asarray(rng.integers(0, S, M, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, C, M, dtype=np.int32))

    def scatter_set(c):
        bk, ps, a, b, w = c
        o0 = jnp.full((S, C), 0xFFFFFFFF, jnp.uint32).at[bk, ps].set(
            a, mode="drop")
        o1 = jnp.full((S, C), 0xFFFFFFFF, jnp.uint32).at[bk, ps].set(
            b, mode="drop")
        ow = jnp.zeros((S, C), jnp.int32).at[bk, ps].set(w, mode="drop")
        return bk, ps, o0[:, 0] ^ a, o1[:, 0] ^ b, ow[:, 0] + w
    bench(f"scatter-set 509k -> ({S},{C}) x3 planes", scatter_set,
          (buckets, pos, q0, q1, qw))

    idx = jnp.asarray(rng.integers(0, M, S * C, dtype=np.int32))

    def gather_take(c):
        ix, a, b, w = c
        g0 = jnp.take(a, ix)
        g1 = jnp.take(b, ix)
        gw = jnp.take(w, ix)
        return ix, a ^ g0[:M], b ^ g1[:M], w + gw[:M]
    bench(f"gather take {S*C} from 509k x3 planes", gather_take,
          (idx, q0, q1, qw))

    starts = jnp.sort(jnp.asarray(rng.integers(0, M, S, dtype=np.int32)))

    def run_gather(c):
        st, a, b, w = c
        ix = jnp.clip(st[:, None] + jnp.arange(C)[None, :], 0, M - 1)
        g0 = jnp.take(a, ix).reshape(-1)[:M]
        g1 = jnp.take(b, ix).reshape(-1)[:M]
        gw = jnp.take(w, ix).reshape(-1)[:M]
        return st, a ^ g0, b ^ g1, w + gw
    bench(f"run-gather ({S},{C}) contiguous from 509k x3", run_gather,
          (starts, q0, q1, qw))


if __name__ == "__main__":
    main()
