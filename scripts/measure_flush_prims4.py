"""Fourth attempt.  block_until_ready appears to be a no-op through the
axon tunnel (a 5M-row sort "completed" in 80 us), so every timing must be
fenced by an actual host download (a 4-byte scalar).  Chain K dispatches,
download a scalar derived from the last output.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

K = 8


def fence(x):
    return float(np.asarray(jnp.sum(x[-1][:1] if isinstance(x, tuple) else x[:1])))


def bench(name, fn, args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    fence(out)  # compile + warm
    # measure the fence-only cost once (RPC + 4B download)
    t0 = time.perf_counter()
    fence(out)
    fence_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    cur = out
    for _ in range(K):
        cur = fn_j(*cur)
    fence(cur)
    per = (time.perf_counter() - t0 - fence_s) / K
    print(f"{name:48s} {per*1e3:9.3f} ms/op  (fence {fence_s*1e3:.1f} ms)",
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

    def rot(x):
        return jnp.roll(x, 1)

    bench("flat lax.sort 5M keys=2 +1 payload",
          lambda a, b, w: jax.lax.sort((rot(a), b, w), num_keys=2),
          (p0, p1, wts))
    for S_ in (256,):
        R_ = N // S_
        bench(f"batched lax.sort ({S_},{R_}) keys=2 +1 payload",
              lambda a, b, w: jax.lax.sort(
                  (rot(a.reshape(-1)).reshape(a.shape), b, w),
                  num_keys=2, dimension=-1),
              (p0.reshape(S_, R_), p1.reshape(S_, R_), wts.reshape(S_, R_)))

    def scans2d(a, b, w):
        neq = (a[:, 1:] != a[:, :-1]) | (b[:, 1:] != b[:, :-1])
        is_end = jnp.concatenate(
            [neq, jnp.ones((a.shape[0], 1), jnp.bool_)], axis=1)
        csum = jnp.cumsum(w, axis=1)
        INT_MAX = jnp.int32(2**31 - 1)
        end_csum = jax.lax.cummin(
            jnp.where(is_end, csum, INT_MAX), axis=1, reverse=True)
        rt = end_csum - (csum - w)
        return rot(a.reshape(-1)).reshape(a.shape), b, rt
    R = N // S
    bench(f"batched scans ({S},{R})", scans2d,
          (p0.reshape(S, R), p1.reshape(S, R), wts.reshape(S, R)))

    def scans1d(a, b, w):
        neq = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        is_end = jnp.concatenate([neq, jnp.ones((1,), jnp.bool_)])
        csum = jnp.cumsum(w)
        INT_MAX = jnp.int32(2**31 - 1)
        end_csum = jax.lax.cummin(
            jnp.where(is_end, csum, INT_MAX), axis=0, reverse=True)
        return rot(a), b, (end_csum - (csum - w))
    bench("flat scans 5M", scans1d, (p0, p1, wts))

    from dsk_tpu.kmer.device import sum_by_key_planes

    def sbk(a, b, w):
        u, c, n = sum_by_key_planes((rot(a), b), w)
        return u[0], u[1], c
    bench("flat sum_by_key_planes 5M W=2 (current flush)", sbk,
          (p0, p1, wts))

    h = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    q0, q1 = p0[:M], p1[:M]
    qw = wts[:M]
    bench("per-batch lax.sort 509k keys=1 +3 payload",
          lambda hh, a, b, w: jax.lax.sort(
              (rot(hh), a, b, w), num_keys=1), (h, q0, q1, qw))
    bench("per-batch lax.sort 509k keys=3 +1 payload",
          lambda hh, a, b, w: jax.lax.sort(
              (rot(hh), a, b, w), num_keys=3), (h, q0, q1, qw))

    C = int(M / S * 2)
    buckets = jnp.asarray(rng.integers(0, S, M, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, C, M, dtype=np.int32))

    def scatter_set(bk, ps, a, b, w):
        o0 = jnp.full((S, C), 0xFFFFFFFF, jnp.uint32).at[bk, ps].set(
            a, mode="drop")
        o1 = jnp.full((S, C), 0xFFFFFFFF, jnp.uint32).at[bk, ps].set(
            b, mode="drop")
        ow = jnp.zeros((S, C), jnp.int32).at[bk, ps].set(w, mode="drop")
        return (jnp.roll(bk, 1), ps, a ^ o0[0, 0], b ^ o1[0, 0],
                w + ow[0, 0])
    bench(f"scatter-set 509k -> ({S},{C}) x3 planes", scatter_set,
          (buckets, pos, q0, q1, qw))

    idx = jnp.asarray(rng.integers(0, M, S * C, dtype=np.int32))

    def gather_take(ix, a, b, w):
        g0 = jnp.take(a, ix)
        g1 = jnp.take(b, ix)
        gw = jnp.take(w, ix)
        return jnp.roll(ix, 1), a ^ g0[:M], b ^ g1[:M], w + gw[:M]
    bench(f"gather take {S*C} from 509k x3 planes", gather_take,
          (idx, q0, q1, qw))


if __name__ == "__main__":
    main()
