"""Round-3 step breakdown at bench geometry (post-weightless-flush).

Times the fused group step and its flush pieces separately on
device-resident data (k=31, G32, cap 1.5M — the 129 Mbases/s config) to
locate the next device-side lever:

  step        = scan(G x [unpack + extract + append]) + flush
  flush       = big keys-only sort + presorted two-stage compaction
                + small fold sort (2*cap)
  residual    = step - measured flush pieces ~ scan cost

Run: python scripts/measure_step_breakdown_r3.py
"""

from __future__ import annotations

import sys
import time


def log(msg: str) -> None:
    print(f"[breakdown] {msg}", file=sys.stderr, flush=True)


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

    from bench import make_batches
    from dsk_tpu.dist.engine import DistCountEngine, default_mesh
    from dsk_tpu.io.packed import pack_codes

    k, rows, row_len, G = 31, 2048, 1024, 32
    cap = (1 << 20) + (1 << 19)
    engine = DistCountEngine(  # hand-packed bitmap groups below
        k, mesh=default_mesh(), batch_rows=rows, row_len=row_len,
        buf_batches=G, table_cap=cap, wire="bitmap",
    )
    engine.compile(progress=log)
    batches = make_batches(G, rows, row_len, seed=0)
    ws, ms = zip(*(pack_codes(b.codes) for b in batches))
    cd = jax.device_put(np.stack(ws), dev)
    md = jax.device_put(np.stack(ms), dev)
    bd = jax.device_put(np.stack([b.bank_ids for b in batches]), dev)
    _ = np.asarray(cd.ravel()[:1])
    group_bases = G * rows * row_len

    def fence(a):
        return float(np.asarray(jnp.sum(a.ravel()[:1].astype(jnp.float32))))

    def best_of(fn, args, label, reps=3):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        fence(leaves[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            fence(leaves[0])
            best = min(best, time.perf_counter() - t0)
        log(f"{label}: {best*1e3:.1f} ms")
        return best, out

    # reference: the full step (init NOT timed; donated -> re-init per rep)
    st = engine._init_state()
    tab_p, tab_c, over, tover = st
    ps = jnp.int32(0)
    t0 = time.perf_counter()
    tab_p, tab_c, over, tover = engine._step(
        cd, md, bd, tab_p, tab_c, over, tover, ps
    )
    fence(over)
    log(f"step compile+first {time.perf_counter()-t0:.1f}s")
    best_step = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        tab_p, tab_c, over, tover = engine._step(
            cd, md, bd, tab_p, tab_c, over, tover, ps
        )
        fence(over)
        best_step = min(best_step, time.perf_counter() - t0)
    log(
        f"full step: {best_step*1e3:.1f} ms = "
        f"{group_bases/best_step/1e6:.1f} Mbases/s"
    )

    # flush pieces on a realistic buffer: duplicate structure from the
    # bench genome (windows over 1M distinct)
    WK = engine.WK
    N = G * engine.plan.bucket_cols  # buffer rows
    rng = np.random.default_rng(0)
    n_distinct = 1 << 20
    vals = rng.integers(0, 1 << 61, n_distinct, dtype=np.uint64)
    pick = vals[rng.integers(0, n_distinct, N)]
    bufs = [
        jax.device_put((pick >> 32).astype(np.uint32), dev),
        jax.device_put((pick & 0xFFFFFFFF).astype(np.uint32), dev),
    ]
    log(f"buffer rows N={N}")

    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=WK))
    t_sort, sorted_keys = best_of(sort2, bufs, "keys-only sort (2 ops)")

    from dsk_tpu.kmer.device import sum_by_key_planes_capped

    def compact(s0, s1):
        dead = (s0 == np.uint32(0xFFFFFFFF)) & (s1 == np.uint32(0xFFFFFFFF))
        w = 1 - dead.astype(jnp.int32)
        return sum_by_key_planes_capped(
            (s0, s1), w, cap, segments=0 or None or 0, presorted=True
        )

    # segments auto like the engine: engine.compact_segments
    segs = engine.compact_segments
    compact_j = jax.jit(
        lambda s0, s1: sum_by_key_planes_capped(
            (s0, s1),
            1 - ((s0 == np.uint32(0xFFFFFFFF))
                 & (s1 == np.uint32(0xFFFFFFFF))).astype(jnp.int32),
            cap,
            segments=segs if segs is not None else 0,
            presorted=True,
        )
    )
    t_comp, comp_out = best_of(
        compact_j, tuple(sorted_keys), f"presorted compaction (segments={segs})"
    )

    buniq, bcounts = comp_out[0], comp_out[1]
    tabp_h = [np.asarray(tab_p).reshape(WK, -1)[w] for w in range(WK)]
    tabc_h = np.asarray(tab_c)
    fold_args = (
        buniq[0], buniq[1], bcounts,
        jax.device_put(tabp_h[0], dev), jax.device_put(tabp_h[1], dev),
        jax.device_put(tabc_h, dev),
    )
    fold_j = jax.jit(
        lambda b0, b1, bc, t0_, t1_, tc: sum_by_key_planes_capped(
            (jnp.concatenate([b0, t0_]), jnp.concatenate([b1, t1_])),
            jnp.concatenate([bc, tc]), cap, segments=0,
        )
    )
    t_fold, _ = best_of(fold_j, fold_args, "fold (2*cap monolithic)")

    resid = best_step - t_sort - t_comp - t_fold
    log(
        f"residual (scan: unpack+extract+append+overheads): "
        f"{resid*1e3:.1f} ms"
    )
    log(
        f"shares: sort {t_sort/best_step*100:.0f}% compaction "
        f"{t_comp/best_step*100:.0f}% fold {t_fold/best_step*100:.0f}% "
        f"scan-residual {resid/best_step*100:.0f}%"
    )


if __name__ == "__main__":
    main()
