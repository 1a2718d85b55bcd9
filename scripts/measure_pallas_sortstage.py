"""Bound the attainable Pallas sort speed vs XLA's lax.sort (VERDICT r2
next-item 4, closure measurement).

TPU has no vector scatter/shuffle-by-index, so every sort is a
COMPARISON NETWORK of static exchange patterns; the only question is
whether a hand-written Pallas bitonic could run the network's stages
meaningfully faster than XLA's sort lowering.  This probe measures the
VPU throughput of exactly the per-stage op mix a bitonic stage needs on
(2-key uint32 + 1 payload) rows in VMEM:

  partner fetch  = 2 rolls per operand (XOR-partner via +/- rolls)
  lexicographic compare on the 2 key words (once per stage)
  direction/bit masks from iota (block-alternating bitonic direction)
  3 selects (one per operand)

The kernel runs NSTAGES unrolled stages over a VMEM-resident tile
(data stays on-chip: this is the best case a hierarchical Pallas sort
could reach for its tile-local stages, with HBM traffic fully hidden).
The projection [stages(N) x measured ns/elem/stage + minimum HBM
passes] is then compared against XLA's measured flat-sort time at the
same N (scripts/measure_sample_sort.py: 181 ms at 33.5M rows).

The probe is a THROUGHPUT model, not a correct sort — exchange
distances cycle a fixed repertoire so lane-dim (d<128, rolls on axis 1)
and sublane-dim (d>=128, rolls on axis 0) stages appear in the same
ratio as a real 2^20-element tile bitonic (7 lane stages + 13 sublane
stages per merge level).

Run: python scripts/measure_pallas_sortstage.py
"""

from __future__ import annotations

import functools
import sys
import time


def log(msg: str) -> None:
    print(f"[sortstage] {msg}", file=sys.stderr, flush=True)


NSTAGES = 80  # unrolled stages per kernel call
R = 512      # sublane rows per tile; tile = R*128 = 65536 elements


def _stage_kernel(k0_ref, k1_ref, p_ref, o0_ref, o1_ref, o2_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    k0 = k0_ref[:]
    k1 = k1_ref[:]
    pay = p_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    flat = rows * 128 + lanes

    # stage repertoire: a real 2^20-tile bitonic runs ~7 lane-dim and
    # ~13 sublane-dim stages per merge level; cycle 2 lane + 4 sublane
    # (lane stages are the expensive ones — keep their share honest)
    dists = [(1, 4), (1, 32), (0, 1), (0, 8), (0, 64), (0, 256)]

    for t in range(NSTAGES):
        axis, d = dists[t % len(dists)]
        step = d * (128 if axis == 0 else 1)
        size = R if axis == 0 else 128
        # XOR-partner via +/- rolls: bit-clear positions partner with
        # +step, bit-set with -step (pltpu.roll takes non-negative
        # shifts: roll by -d == roll by size-d)
        y0 = pltpu.roll(k0, size - d, axis)
        z0 = pltpu.roll(k0, d, axis)
        y1 = pltpu.roll(k1, size - d, axis)
        z1 = pltpu.roll(k1, d, axis)
        yp = pltpu.roll(pay, size - d, axis)
        zp = pltpu.roll(pay, d, axis)
        bit = (flat // step) % 2 == 0
        asc = (flat // (2 * step)) % 2 == 0
        p0 = jnp.where(bit, y0, z0)
        p1 = jnp.where(bit, y1, z1)
        pp = jnp.where(bit, yp, zp)
        le = (k0 < p0) | ((k0 == p0) & (k1 <= p1))
        keep = le ^ bit ^ asc
        k0 = jnp.where(keep, k0, p0)
        k1 = jnp.where(keep, k1, p1)
        pay = jnp.where(keep, pay, pp)
    o0_ref[:] = k0
    o1_ref[:] = k1
    o2_ref[:] = pay


def main() -> None:
    sys.path.insert(0, ".")
    from dsk_tpu.utils.hostmem import tune_malloc

    tune_malloc()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    dev = jax.devices()[0]
    log(f"device: {dev}")
    x = jax.device_put(np.arange(8, dtype=np.int32), dev)
    assert int(np.asarray(x)[3]) == 3

    TILES = 256
    N = TILES * R * 128  # 16.8M elements
    rng = np.random.default_rng(0)
    arrs = [
        jax.device_put(
            rng.integers(0, 1 << 32, (TILES * R, 128), dtype=np.uint32),
            dev,
        )
        for _ in range(3)
    ]

    @jax.jit
    def run(a, b, c):
        return pl.pallas_call(
            _stage_kernel,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((TILES * R, 128), jnp.uint32)
            ] * 3,
        )(a, b, c)

    def fence(t):
        return float(np.asarray(jnp.sum(t[0].ravel()[:1].astype(jnp.float32))))

    out = run(*arrs)
    fence(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(*arrs)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    ns_per_elem_stage = best / N / NSTAGES * 1e9
    log(
        f"{NSTAGES} stages over {N} elems (VMEM-resident): {best*1e3:.1f}"
        f" ms -> {ns_per_elem_stage:.3f} ns/elem/stage"
    )

    # projection: full bitonic over N33 = 33.5M rows needs
    # log2(N)*(log2(N)+1)/2 = 325 stages; a hierarchical Pallas sort
    # runs ~171 of them tile-locally (2^18-elem tiles) at this measured
    # rate and the remaining ~154 cross-tile stages pay HBM traffic
    # (>= 1 fused read+write of 12 B/row per ~2 stages at best,
    # matching XLA's observed fusion depth) — floor them at pure
    # bandwidth 820 GB/s.
    N33 = 33_554_432
    stages = 325
    vpu_ms = stages * N33 * ns_per_elem_stage / 1e6
    tile_stages = 171
    cross = stages - tile_stages
    hbm_passes = cross / 2
    hbm_ms = hbm_passes * (N33 * 12 * 2) / 820e9 * 1e3
    hier_ms = tile_stages * N33 * ns_per_elem_stage / 1e6 + max(
        hbm_ms, cross * N33 * ns_per_elem_stage / 1e6
    )
    log(
        f"projected all-VPU bitonic at 33.5M rows: {vpu_ms:.0f} ms; "
        f"hierarchical (tile-local VMEM + bandwidth-floored cross-tile):"
        f" {hier_ms:.0f} ms; XLA measured: 181 ms"
    )
    log(
        f"XLA/attainable ratio: {181/hier_ms:.2f}x "
        f"(>0.8 => XLA within ~20% of attainable)"
    )


if __name__ == "__main__":
    main()
