"""Validate the bucketized-flush design shapes on the real chip (fenced).

Flush = batched sort over (S, BC + cap_b) incl. sentinel padding;
bucketize = per-batch 1-key sort + S unrolled dynamic-slices.
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
    fence(out)
    t0 = time.perf_counter()
    fence(out)
    fence_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    cur = out
    for _ in range(K):
        cur = fn_j(*cur)
    fence(cur)
    per = (time.perf_counter() - t0 - fence_s) / K
    print(f"{name:52s} {per*1e3:9.3f} ms/op", flush=True)
    return per


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    def rot(x):
        return jnp.roll(x.reshape(-1), 1).reshape(x.shape)

    M = 512 * 994

    # flush shapes: buffer 8 batches x 1.35 slack + table 1M, S buckets
    for S in (8, 32, 128):
        R = (int(8 * M * 1.35) + (1 << 20)) // S
        R = (R + 511) // 512 * 512
        a = jnp.asarray(rng.integers(0, 2**32, (S, R), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (S, R), dtype=np.uint32))
        w = jnp.asarray(rng.integers(0, 3, (S, R), dtype=np.int32))
        bench(f"flush batched sort ({S},{R})={S*R/1e6:.1f}M keys=2+1",
              lambda x, y, z: jax.lax.sort((rot(x), y, z), num_keys=2,
                                           dimension=-1), (a, b, w))
        bench(f"flush batched compact ({S},{R}) keys=1+3",
              lambda x, y, z: jax.lax.sort((rot(x), y, z), num_keys=1,
                                           dimension=-1), (a, b, w))

    # per-batch bucketize: 1-key sort + S dynamic slices x 3 planes
    h = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    q0 = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    q1 = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    qw = jnp.asarray(rng.integers(0, 3, M, dtype=np.int32))

    for S in (8, 32):
        C = int(M / S * 1.35)

        def bucketize(hh, x, y, z, S=S, C=C):
            bkey = hh >> jnp.uint32(32 - int(np.log2(S)))
            s = jax.lax.sort((bkey, x, y, z), num_keys=1)
            sb, sx, sy, sz = s
            ar = jnp.arange(S, dtype=jnp.uint32)
            starts = jnp.sum(
                sb[None, :] < ar[:, None], axis=1
            ).astype(jnp.int32)
            pads = jnp.full((C,), 0xFFFFFFFF, jnp.uint32)
            padz = jnp.zeros((C,), jnp.int32)
            sxp = jnp.concatenate([sx, pads])
            syp = jnp.concatenate([sy, pads])
            szp = jnp.concatenate([sz, padz])
            outs = []
            for plane in (sxp, syp):
                outs.append(jnp.stack([
                    jax.lax.dynamic_slice(plane, (starts[i],), (C,))
                    for i in range(S)
                ]))
            outw = jnp.stack([
                jax.lax.dynamic_slice(szp, (starts[i],), (C,))
                for i in range(S)
            ])
            return rot(hh), outs[0][:, :M // S], outs[1][:, :M // S], \
                outw[:, :M // S].astype(jnp.int32)

        def wrapper(hh, S=S, C=C):
            r = bucketize(hh, q0, q1, qw, S=S, C=C)
            return (r[0],)
        bench(f"bucketize 509k S={S} (sort+{S} slices x3)",
              wrapper, (h,))


if __name__ == "__main__":
    main()
