"""k=63 (W=4) flush profile + W-aware A/B (VERDICT r3 weak #2).

k63's fenced ceiling lags k31 by 1.6x (89.5 vs 142.4 Mbases/s) while its
weightless flush sort moves 2x the key bytes — so the sort is not purely
bandwidth-bound.  This measures where the k63 step actually goes:

  1. fenced full step (baseline),
  2. the flush pieces in isolation at production shapes:
     big 4-plane sort | unit compaction | table fold,
  3. extraction-only (scan of G route steps, no flush),
  4. W-aware A/B on the big sort:
     a. 4x uint32 planes, num_keys=4            (production)
     b. 2x uint64 packed keys, num_keys=2       (same bytes, half the
        comparator tuples — tests whether stages are tuple-overhead-
        bound; u64 is emulated on TPU so this can also lose)
     c. 2x uint32 (w0,w1) keys + 2 carried      (comparator reads 8 of
        16 B/row — correctness would need a collision fix-up, measured
        here only as a BOUND on what prefix-sorting could buy)

Run: JAX_PLATFORMS=axon python scripts/measure_k63_profile.py
Protocol per CLAUDE.md: warmup fetch, fenced best-of-3, generous
timeouts, stderr progress.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def log(m):
    print(f"[k63] {m}", file=sys.stderr, flush=True)


def main() -> int:
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()
    import jax

    # real uint64 keys need jax_enable_x64 — but x64 breaks the engine's
    # traced int32 indices, so the u64 A/B runs in its OWN process
    # (--x64-sorts-only: standalone sorts, no engine)
    x64_only = "--x64-sorts-only" in sys.argv
    if x64_only:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    d0 = jax.devices()[0]
    log(f"device: {d0}")
    x = jax.device_put(np.arange(8, dtype=np.int32), d0)
    assert int(np.asarray(x)[3]) == 3
    log("warmup ok")

    from dsk_tpu.dist.engine import DistCountEngine, _locfree, default_mesh
    from dsk_tpu.io.batch import Batch
    from dsk_tpu.io.packed import pack_codes_exc

    k = 63
    rows, row_len = 2048, 1024
    G = 16
    cap = (1 << 20) + (1 << 19)
    if x64_only:
        eng = None
        W = 4
        Nbuf = 31522816  # match the engine run's buffer rows
    else:
        eng = DistCountEngine(
            k, mesh=default_mesh(), batch_rows=rows, row_len=row_len,
            buf_batches=G, table_cap=cap,
        )
        eng.compile(progress=log)
        W = eng.W
        Nbuf = eng.plan.buf_batches * eng.plan.bucket_cols
        log(f"W={W} Nbuf={Nbuf} cap={cap} "
            f"segments={eng.compact_segments}")

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=1 << 20, dtype=np.uint8)
    batches = []
    if not x64_only:
        for _ in range(G):
            starts = rng.integers(0, (1 << 20) - row_len, size=rows)
            codes = genome[starts[:, None] + np.arange(row_len)[None, :]]
            batches.append(
                Batch(codes=codes, bank_ids=np.zeros(rows, np.int32),
                      n_rows=rows, n_bases=int(codes.size),
                      n_reads=rows))
        ws, ms = zip(*(pack_codes_exc(b.codes) for b in batches))
        cd = jax.device_put(np.stack(ws), d0)
        md = jax.device_put(np.stack(ms), d0)
        bd = jax.device_put(np.stack([b.bank_ids for b in batches]), d0)
    def fence(a):
        while isinstance(a, (tuple, list)):
            a = a[0]
        return float(np.asarray(jnp.sum(a.ravel()[:1].astype(jnp.float32))))
    if not x64_only:
        fence(cd)
    bases = sum(b.n_bases for b in batches) if batches else 0

    def best3(fn, *args):
        best = float("inf")
        out = None
        for rep in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            fence(out[0] if isinstance(out, tuple) else out)
            if rep:
                best = min(best, time.perf_counter() - t0)
        return best, out

    results = {}

    # 1. fenced full step
    t_step = None
    if not x64_only:
        def full_step():
            tab = eng._init_state()
            return eng._step(cd, md, bd, *tab, jnp.int32(0))[3]

        t_step, _ = best3(full_step)
        results["step_s"] = round(t_step, 3)
        results["device_bases_per_s"] = round(bases / t_step, 1)
        log(f"full step {t_step:.3f}s = "
            f"{bases / t_step / 1e6:.1f} Mbases/s")

    # synthetic buffer rows shaped like the real flush input: sorted-
    # input cost equals real cost for comparison networks only if the
    # data is unsorted — use random planes with ~the same live fraction
    live_frac = 0.74  # packed-read valid-window fraction at 1024 rows
    n_live = int(Nbuf * live_frac)
    planes_h = [
        np.concatenate([
            rng.integers(0, 2**32, size=n_live, dtype=np.uint32),
            np.full(Nbuf - n_live, 0xFFFFFFFF, np.uint32),
        ]) for _ in range(W)
    ]
    perm = rng.permutation(Nbuf)
    planes_h = [p[perm] for p in planes_h]
    pd = [jax.device_put(p, d0) for p in planes_h]
    fence(pd[0])

    # 2a. big sort, 4x uint32 num_keys=4 (production shape)
    with _locfree():
        sort4 = jax.jit(
            lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=4)
        ).lower(*pd).compile()
    t, _ = best3(lambda: sort4(*pd))
    results["sort4_u32_s"] = round(t, 3)
    log(f"sort 4xu32 keys: {t:.3f}s")

    # 2b. 2x uint64 packed keys (real u64 only under --x64-sorts-only;
    # x64 breaks the engine's traced indices so it gets its own process)
    if x64_only:
        with _locfree():
            pack64 = jax.jit(
                lambda a, b, c, d: (
                    (a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64),
                    (c.astype(jnp.uint64) << 32) | d.astype(jnp.uint64),
                )
            ).lower(*pd).compile()
        p64 = pack64(*pd)
        fence(p64[0])
        with _locfree():
            sort2_64 = jax.jit(
                lambda a, b: jax.lax.sort((a, b), num_keys=2)
            ).lower(*p64).compile()
        t, _ = best3(lambda: sort2_64(*p64))
        results["sort2_u64_s"] = round(t, 3)
        log(f"sort 2xu64 keys: {t:.3f}s")
        # also re-measure the 4xu32 baseline in THIS process for a
        # same-window comparison
        print(json.dumps({"gate": "k63_profile_x64", **results}),
              flush=True)
        return 0

    # 2c. bound: 2x uint32 keys + 2 carried operands
    with _locfree():
        sort2c = jax.jit(
            lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=2)
        ).lower(*pd).compile()
    t, _ = best3(lambda: sort2c(*pd))
    results["sort2_u32_carry2_s"] = round(t, 3)
    log(f"sort 2xu32 keys + 2 carried: {t:.3f}s")

    # 2d. k31 reference at the same row count (bytes halved)
    with _locfree():
        sort2 = jax.jit(
            lambda a, b: jax.lax.sort((a, b), num_keys=2)
        ).lower(pd[0], pd[1]).compile()
    t, _ = best3(lambda: sort2(pd[0], pd[1]))
    results["sort2_u32_s"] = round(t, 3)
    log(f"sort 2xu32 keys (k31 shape): {t:.3f}s")

    # 3. compaction + fold at production shapes (sorted input)
    sorted4 = sort4(*pd)
    fence(sorted4[0])
    from dsk_tpu.kmer.device import (
        compact_heads_unit,
        sum_by_key_planes_capped,
    )

    with _locfree():
        comp = jax.jit(
            lambda a, b, c, d: compact_heads_unit(
                (a, b, c, d), cap, segments=eng.compact_segments
            )
        ).lower(*sorted4).compile()
    t, out = best3(lambda: comp(*sorted4))
    results["compact_s"] = round(t, 3)
    log(f"unit compaction: {t:.3f}s")

    buniq = out[0]
    bcounts = out[1]
    tab0 = [jnp.full((cap,), 0xFFFFFFFF, jnp.uint32) for _ in range(W)]
    tc0 = jnp.zeros((cap,), jnp.int32)

    def fold():
        planes = tuple(
            jnp.concatenate([buniq[w], tab0[w]]) for w in range(W)
        )
        weights = jnp.concatenate([bcounts, tc0])
        return sum_by_key_planes_capped(planes, weights, cap, segments=0)

    with _locfree():
        foldc = jax.jit(fold).lower().compile()
    t, _ = best3(lambda: foldc())
    results["fold_s"] = round(t, 3)
    log(f"table fold: {t:.3f}s")

    flush = results["sort4_u32_s"] + results["compact_s"] + results["fold_s"]
    results["flush_total_s"] = round(flush, 3)
    results["scan_extract_s"] = round(t_step - flush, 3)
    results["flush_frac"] = round(flush / t_step, 3)
    print(json.dumps({"gate": "k63_profile", **results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
