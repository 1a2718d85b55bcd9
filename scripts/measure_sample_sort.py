"""Measure: can a sample-sort decomposition beat the flat flush sort?

The flush's dominant cost is ONE flat (WK+1)-operand lax.sort over all
buffer+table rows (~66M at the bench geometry; VERDICT r2 next-item 4:
flush ~= 85% of group time).  Round 2 measured batched VMEM-sized 1-key
sorts at ~4x cheaper per row (two-stage compaction study).  This script
checks whether that batched advantage holds for the MULTI-operand key
sort at flush shapes, and whether the full sample-sort pipeline —

  stage A: batched (S, L) segment sorts (dim=1);
  stage B: splitters from a per-segment sample -> per-segment
           searchsorted bucket starts -> masked arange gather into
           (B, S, slack) with overflow-loss accounting (the two-stage
           compaction's slack valve pattern);
  stage C: batched per-bucket sorts of (B, S*slack) sentinel-padded rows

— beats the flat sort end-to-end.  Output is globally sorted with
sentinel gaps (each key maps to exactly one bucket, so runs stay
contiguous), which the existing dedup/compaction already accepts.

Run: python scripts/measure_sample_sort.py [N_MROWS] (default 32)
Protocol per CLAUDE.md: tune_malloc, warmup put+fetch, one process,
best-of-3 fenced timings, stderr progress.
"""

from __future__ import annotations

import sys
import time

SENTINEL = 0xFFFFFFFF


def log(msg: str) -> None:
    print(f"[sample_sort] {msg}", file=sys.stderr, flush=True)


def sample_sort(planes, weights, S, B, slack, num_keys, Q=64):
    """Full sample-sort pipeline: (N,) planes -> (B*S*slack,) sorted
    planes with sentinel padding + n_lost.  Pure XLA, static shapes."""
    import jax
    import jax.numpy as jnp

    N = planes[0].shape[0]
    L = N // S
    # stage A: batched segment sorts
    ops = tuple(p.reshape(S, L) for p in planes) + (
        weights.reshape(S, L),
    )
    s = jax.lax.sort(ops, num_keys=num_keys, dimension=1)
    sp, sw = s[:num_keys], s[num_keys]
    extra = s[num_keys + 1:]  # non-key payload operands, if any

    # stage B: splitters from a (S*Q) sample of the PRIMARY word.
    # (bucket id from word 0 only: a key's bucket must not depend on
    # which segment it sat in; ties on word 0 straddling a splitter put
    # a key's duplicates in ADJACENT buckets only when word0 values
    # collide with the splitter — avoided by splitting on word 0 and
    # treating equal-to-splitter as one side consistently, which
    # searchsorted('left') does.)
    w0 = sp[0]
    sample = w0[:, :: max(L // Q, 1)][:, :Q].reshape(-1)
    ssamp = jnp.sort(sample)
    split = ssamp[:: max((S * Q) // B, 1)][1:B]  # (B-1,) ascending
    starts = jax.vmap(lambda row: jnp.searchsorted(row, split))(w0)
    starts = jnp.concatenate(
        [jnp.zeros((S, 1), starts.dtype), starts], axis=1
    )  # (S, B)
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((S, 1), L, starts.dtype)], axis=1
    )
    n_lost = jnp.sum(
        jnp.maximum(ends - starts - slack, 0).astype(jnp.int32)
    )
    idx = starts[:, :, None] + jnp.arange(slack)[None, None, :]
    valid = idx < ends[:, :, None]
    idxc = jnp.minimum(idx, L - 1)

    def take(a2d, fill):
        g = jnp.take_along_axis(a2d[:, None, :], idxc, axis=2)
        return jnp.where(valid, g, fill)

    gp = [take(p, jnp.uint32(SENTINEL)) for p in sp]  # (S, B, slack)
    gw = take(sw, 0)
    gx = [take(e, jnp.uint32(SENTINEL)) for e in extra]

    # stage C: per-bucket batched sorts over all segments' slices
    def to_bucket(a):
        return a.transpose(1, 0, 2).reshape(B, S * slack)

    ops2 = tuple(to_bucket(g) for g in gp) + (
        to_bucket(gw),
    ) + tuple(to_bucket(g) for g in gx)
    s2 = jax.lax.sort(ops2, num_keys=num_keys, dimension=1)
    out_p = tuple(o.reshape(B * S * slack) for o in s2[:num_keys])
    out_w = s2[num_keys].reshape(B * S * slack)
    out_x = tuple(o.reshape(B * S * slack) for o in s2[num_keys + 1:])
    return out_p, out_w, out_x, n_lost


def main() -> None:
    sys.path.insert(0, ".")
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]
    log(f"device: {dev}")
    x = jax.device_put(np.arange(8, dtype=np.int32), dev)
    assert int(np.asarray(x)[3]) == 3
    log("warmup ok")

    MROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = MROWS << 20
    WK = 2  # k=31
    rng = np.random.default_rng(0)
    log(f"N={N} rows, WK={WK} key words + 1 weight")

    # canonical-kmer-shaped keys: ~60x duplication (64M windows over
    # ~1M distinct), value-biased low like canonical mins
    n_distinct = max(N // 60, 1)
    vals = np.sort(
        rng.integers(0, 1 << 62, n_distinct, dtype=np.uint64)
    )
    pick = vals[rng.integers(0, n_distinct, N)]
    p_host = [
        (pick >> 32).astype(np.uint32),
        (pick & 0xFFFFFFFF).astype(np.uint32),
    ]
    planes = tuple(jax.device_put(p, dev) for p in p_host)
    weights = jax.device_put(np.ones(N, np.int32), dev)

    def fence(a):
        return float(np.asarray(jnp.sum(a.ravel()[:1].astype(jnp.float32))))

    def best_of(fn, label="", reps=3):
        f = jax.jit(fn)
        out = f(*planes, weights)
        leaves = jax.tree_util.tree_leaves(out)
        fence(leaves[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*planes, weights)
            leaves = jax.tree_util.tree_leaves(out)
            fence(leaves[0])
            best = min(best, time.perf_counter() - t0)
        log(f"{label}: {best*1e3:.1f} ms ({best*1e3/MROWS:.2f} ms/Mrow)")
        return best, out

    # 1. flat sort (current flush cost)
    t_flat, flat_out = best_of(
        lambda p0, p1, w: jax.lax.sort((p0, p1, w), num_keys=WK),
        label="flat sort",
    )

    # 2. batched segment sorts alone (stage A cost at various S)
    for S in (32, 64, 128, 256):
        L = N // S
        best_of(
            lambda p0, p1, w, _S=S, _L=L: jax.lax.sort(
                (
                    p0.reshape(_S, _L),
                    p1.reshape(_S, _L),
                    w.reshape(_S, _L),
                ),
                num_keys=WK,
                dimension=1,
            ),
            label=f"stage A only (S={S})",
        )

    # 3. full sample sort at several geometries
    results = {}
    for S, B, slack_f in (
        (64, 64, 1.5),
        (128, 128, 1.5),
        (128, 128, 1.25),
        (256, 256, 1.5),
    ):
        L = N // S
        slack = int(slack_f * L / B)

        def full(p0, p1, w, _S=S, _B=B, _sl=slack):
            return sample_sort((p0, p1), w, _S, _B, _sl, WK)

        t, out = best_of(
            full, label=f"sample sort S={S} B={B} slack={slack_f}x"
        )
        n_lost = int(out[3])
        log(f"  n_lost={n_lost} ({n_lost/N*100:.3f}%)")
        results[(S, B, slack_f)] = (t, n_lost)

        if N <= (8 << 20) or (S, B, slack_f) == (128, 128, 1.5):
            # correctness: dropping sentinels reproduces the flat sort
            op0 = np.asarray(out[0][0])
            op1 = np.asarray(out[0][1])
            ow = np.asarray(out[1])
            live = ~((op0 == SENTINEL) & (op1 == SENTINEL))
            f0 = np.asarray(flat_out[0])
            f1 = np.asarray(flat_out[1])
            if n_lost == 0:
                same = (
                    (op0[live] == f0).all() and (op1[live] == f1).all()
                )
                log(f"  value-exact vs flat sort: {same}")

    t_bw, _ = best_of(
        lambda p0, p1, w: (p0 + 1, p1 + 1, w + 1),
        label="1 rw pass (bandwidth ref)",
    )
    best = min(results.items(), key=lambda kv: kv[1][0])
    log(
        f"BEST sample {best[0]}: {best[1][0]*1e3:.1f} ms vs flat "
        f"{t_flat*1e3:.1f} ms -> {t_flat/best[1][0]:.2f}x; flat is "
        f"{t_flat/t_bw:.1f} rw-passes, best sample {best[1][0]/t_bw:.1f}"
    )


if __name__ == "__main__":
    main()
