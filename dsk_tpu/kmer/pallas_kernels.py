"""Pallas TPU kernels for the hot per-base loop.

HOT LOOP #1 of the reference (per-base rolling canonical extraction,
gatb ModelCanonical — SURVEY.md C2, 3.1) as a VMEM-resident Pallas kernel:
the jnp version materializes ~4k intermediate (B, nw) arrays through HBM;
here the whole unrolled shifted-add sweep stays on-chip per tile.

Layout: outputs are WORD PLANES (W, B, nw) — word w of every window is a
contiguous plane, so the downstream lax.sort consumes plane slices with no
strided copies (sort operands are 1D arrays).

The kernel is shape-static per (k, L, tile) and dispatched like the
reference's KSIZE template list (src/DSK.cpp:100-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsk_tpu.kmer.codec import words_per_kmer

SENTINEL32 = 0xFFFFFFFF


def _extract_kernel(codes_ref, planes_ref, valid_ref, *, k: int, W: int, nw: int):
    """Doubling ("prefix-pack") extraction: build packed-16-base codes at
    EVERY position with log2(16)=4 shift|or sweeps, then assemble each
    window's W words from 16-base blocks.  O(L log 16) work and O(1)
    temporaries — the naive 2k-term shifted-add sweep keeps all k slice
    temporaries live and blows the VMEM stack for k ~ 31.
    """
    codes = codes_ref[:]                       # (TB, L) uint8 (int32 lanes)
    TB, L = codes.shape
    c32 = codes.astype(jnp.uint32)
    okay = c32 <= 3
    c = jnp.where(okay, c32, 0)
    # pad by 16 so every P16/R16 gather below stays in bounds
    pad = jnp.zeros((TB, 16), jnp.uint32)
    c = jnp.concatenate([c, pad], axis=1)
    comp = jnp.concatenate([jnp.where(okay, c32 ^ 2, 0), pad], axis=1)
    okp = jnp.concatenate([okay, pad.astype(jnp.bool_)], axis=1)

    # P16[p] = bases p..p+15 packed fwd (base p most significant)
    P = c
    for lvl in (1, 2, 4, 8):
        P = (P[:, :-lvl] << (2 * lvl)) | P[:, lvl:]
    # R16[p] = revcomp of bases p..p+15 (comp(base p+15) most significant)
    R = comp
    for lvl in (1, 2, 4, 8):
        R = (R[:, lvl:] << (2 * lvl)) | R[:, :-lvl]
    # V16[p] = all of bases p..p+15 valid; V[lvl] tables for the r-tail
    V = okp
    vtab = {1: V}
    for lvl in (1, 2, 4, 8):
        V = V[:, :-lvl] & V[:, lvl:]
        vtab[2 * lvl] = V

    r = k - 16 * (W - 1)          # bases in the most-significant word, 1..16
    mask_r = (1 << (2 * r)) - 1

    # window validity: W-1 full 16-blocks + one r-block (doubling AND)
    if r == 16:
        vr = vtab[16]
    else:
        a = 1
        while a * 2 < r:
            a *= 2
        vr = vtab[a][:, : L + 17 - r] & vtab[a][:, r - a : L + 17 - a]
    valid = vr[:, :nw]
    for w in range(1, W):
        off = r + 16 * (w - 1)
        valid = valid & vtab[16][:, off : off + nw]

    # canonical select: compare word-by-word, most significant first
    def fwd_word(w):
        if w == 0:
            return (P[:, :nw] >> (32 - 2 * r)) if r < 16 else P[:, :nw]
        off = r + 16 * (w - 1)
        return P[:, off : off + nw]

    def rc_word(w):
        # rc word w must split at 32-bit word boundaries exactly like the
        # forward path (and the jnp reference, device.py:114-124): word w
        # (w >= 1) is the full 16-base block R16[p + 16*(W-1-w)]; word 0 is
        # the top r bases of R16[p + k - 16], i.e. >> (32 - 2r).  (W == 1:
        # the low 2k bits of R16[p].)
        if W == 1:
            return R[:, :nw] & jnp.uint32(mask_r)
        if w == 0:
            blk = R[:, k - 16 : k - 16 + nw]
            return (blk >> (32 - 2 * r)) if r < 16 else blk
        off = 16 * (W - 1 - w)
        return R[:, off : off + nw]

    lt = jnp.zeros((TB, nw), jnp.bool_)
    eq = jnp.ones((TB, nw), jnp.bool_)
    for w in range(W):
        fw, rw = fwd_word(w), rc_word(w)
        lt = lt | (eq & (fw < rw))
        eq = eq & (fw == rw)
    use_fwd = lt | eq
    for w in range(W):
        canon = jnp.where(use_fwd, fwd_word(w), rc_word(w))
        planes_ref[w, :, :] = jnp.where(valid, canon, jnp.uint32(SENTINEL32))
    valid_ref[:, :] = valid


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def extract_canonical_planes_tpu(
    batch: jax.Array, k: int, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """(B, L) uint8 codes -> ((W, B, nw) uint32 canonical planes, (B, nw) valid).

    Pallas version of dsk_tpu.kmer.device.extract_canonical with word-plane
    output layout.  Sentinel planes on invalid windows.
    """
    B, L = batch.shape
    W = words_per_kmer(k)
    nw = L - k + 1
    TB = B
    # keep the tile under ~6 MB of VMEM: ~12 (TB, L) u32 temporaries of the
    # doubling sweeps + W output planes + valid
    per_row = (12 + W) * (L + 16) * 4
    max_rows = max(8, (6 << 20) // max(per_row, 1))
    while TB > max_rows or (B % TB != 0 and TB > 1):
        TB //= 2
    # Mosaic requires the sublane block dim to be a multiple of 8 (or the
    # whole array); odd batch_rows would land here with TB=2 and fail
    if TB != B and TB % 8 != 0:
        raise ValueError(
            f"batch rows {B} not tileable (TB={TB}); use a multiple of 8"
        )
    grid = (B // TB,)

    kernel = functools.partial(_extract_kernel, k=k, W=W, nw=nw)
    planes, valid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, TB, nw), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((W, B, nw), jnp.uint32),
            jax.ShapeDtypeStruct((B, nw), jnp.bool_),
        ],
        interpret=interpret,
    )(batch)
    return planes, valid


def extract_canonical_planes_jnp(batch: jax.Array, k: int):
    """Reference jnp implementation with the same plane layout (fallback +
    cross-check; wraps dsk_tpu.kmer.device.extract_canonical)."""
    from dsk_tpu.kmer.device import extract_canonical

    words, valid = extract_canonical(batch, k)  # (B, nw, W)
    return jnp.moveaxis(words, -1, 0), valid


MIN_PALLAS_ROW_LEN = 128  # Mosaic rejects sub-lane-width rows
                          # ("Invalid vector register cast" for L < 128)


def extract_canonical_planes(batch: jax.Array, k: int):
    """Dispatch: Pallas on TPU (rows >= one lane width, tileable row
    count), jnp elsewhere."""
    B, L = batch.shape
    if (
        jax.devices()[0].platform == "tpu"
        and L >= MIN_PALLAS_ROW_LEN
        and (B % 8 == 0 or B < 8)
    ):
        return extract_canonical_planes_tpu(batch, k)
    return extract_canonical_planes_jnp(batch, k)
