"""Measure candidate flush primitives on the real chip.

Decides the round-2 flush redesign (VERDICT item 1): can a bucketized
(batched small sorts) flush beat the flat lax.sort merge?  Times, per
variant, best-of-3 after warmup.  Run serially (remote compile service).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn_j(*args))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    n = args[0].shape[0] if args[0].ndim == 1 else args[0].size // (
        args[0].shape[-1] if False else 1
    )
    print(
        f"{name:48s} {best*1e3:9.3f} ms  (compile {compile_s:.1f}s)",
        flush=True,
    )
    return best


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.default_rng(0)

    W = 2
    N = 5 << 20          # flat flush size (buffer 4M + table 1M)
    M = 512 * 994        # per-batch windows (bench config)
    S = 256              # buckets

    p0 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    p1 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    wts = jnp.asarray(rng.integers(0, 3, N, dtype=np.int32))

    from dsk_tpu.kmer.device import sum_by_key_planes

    bench("flat sum_by_key_planes 5M W=2 (current flush)",
          lambda a, b, w: sum_by_key_planes((a, b), w), p0, p1, wts)
    bench("flat lax.sort 5M keys=2 +1 payload",
          lambda a, b, w: jax.lax.sort((a, b, w), num_keys=2), p0, p1, wts)
    bench("flat lax.sort 5M keys=1 +2 payload",
          lambda a, b, w: jax.lax.sort((a, b, w), num_keys=1), p0, p1, wts)

    R = N // S
    b0 = p0.reshape(S, R)
    b1 = p1.reshape(S, R)
    bw = wts.reshape(S, R)
    bench(f"batched lax.sort ({S},{R}) keys=2 +1 payload",
          lambda a, b, w: jax.lax.sort((a, b, w), num_keys=2, dimension=-1),
          b0, b1, bw)
    S2, R2 = 1024, N // 1024
    bench(f"batched lax.sort ({S2},{R2}) keys=2 +1 payload",
          lambda a, b, w: jax.lax.sort((a, b, w), num_keys=2, dimension=-1),
          b0.reshape(S2, R2), b1.reshape(S2, R2), bw.reshape(S2, R2))
    S3, R3 = 64, N // 64
    bench(f"batched lax.sort ({S3},{R3}) keys=2 +1 payload",
          lambda a, b, w: jax.lax.sort((a, b, w), num_keys=2, dimension=-1),
          b0.reshape(S3, R3), b1.reshape(S3, R3), bw.reshape(S3, R3))

    # batched scans (run detection + totals) at (S, R)
    def batched_scans(a, b, w):
        neq = (a[:, 1:] != a[:, :-1]) | (b[:, 1:] != b[:, :-1])
        is_end = jnp.concatenate(
            [neq, jnp.ones((a.shape[0], 1), jnp.bool_)], axis=1)
        csum = jnp.cumsum(w, axis=1)
        INT_MAX = jnp.int32(2**31 - 1)
        end_csum = jax.lax.cummin(
            jnp.where(is_end, csum, INT_MAX), axis=1, reverse=True)
        return end_csum - (csum - w)
    bench(f"batched scans ({S},{R})", batched_scans, b0, b1, bw)

    # per-batch: hash-sort m rows, 1 hash key + W word payloads + weight
    h = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    q0, q1 = p0[:M], p1[:M]
    qw = wts[:M]
    bench("per-batch lax.sort 509k keys=1 +3 payload",
          lambda hh, a, b, w: jax.lax.sort((hh, a, b, w), num_keys=1),
          h, q0, q1, qw)
    bench("per-batch lax.sort 509k keys=3 +1 payload",
          lambda hh, a, b, w: jax.lax.sort((hh, a, b, w), num_keys=3),
          h, q0, q1, qw)

    # append variants: scatter-set vs gather(take)
    C = int(M / S * 2)
    buckets = jnp.asarray(rng.integers(0, S, M, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, C, M, dtype=np.int32))

    def scatter_set(bk, ps, a, b, w):
        o0 = jnp.full((S, C), 0xFFFFFFFF, jnp.uint32).at[bk, ps].set(
            a, mode="drop")
        o1 = jnp.full((S, C), 0xFFFFFFFF, jnp.uint32).at[bk, ps].set(
            b, mode="drop")
        ow = jnp.zeros((S, C), jnp.int32).at[bk, ps].set(w, mode="drop")
        return o0, o1, ow
    bench(f"scatter-set 509k -> ({S},{C}) x3 planes",
          scatter_set, buckets, pos, q0, q1, qw)

    idx = jnp.asarray(rng.integers(0, M, S * C, dtype=np.int32))

    def gather_take(ix, a, b, w):
        return jnp.take(a, ix), jnp.take(b, ix), jnp.take(w, ix)
    bench(f"gather take {S*C} from 509k x3 planes", gather_take,
          idx, q0, q1, qw)

    # contiguous-run gather (the bucket-append pattern: idx = start[b]+j)
    starts = jnp.sort(jnp.asarray(rng.integers(0, M, S, dtype=np.int32)))
    def run_gather(st, a, b, w):
        ix = jnp.clip(st[:, None] + jnp.arange(C)[None, :], 0, M - 1)
        return jnp.take(a, ix), jnp.take(b, ix), jnp.take(w, ix)
    bench(f"run-gather ({S},{C}) contiguous from 509k x3", run_gather,
          starts, q0, q1, qw)

    # dynamic_slice unrolled variant for comparison (S slices)
    def dyn_slices(st, a):
        outs = [
            jax.lax.dynamic_slice(a, (st[i],), (C,)) for i in range(S)
        ]
        return jnp.stack(outs)
    bench(f"unrolled dynamic_slice x{S} of {C} from 509k x1",
          dyn_slices, starts, q0)

    bench("searchsorted 256 probes in 509k",
          lambda a, v: jnp.searchsorted(a, v), jnp.sort(h),
          jnp.asarray(rng.integers(0, 2**32, S, dtype=np.uint32)))


if __name__ == "__main__":
    main()
