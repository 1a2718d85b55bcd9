"""Packed host->device wire format: 2-bit codes + validity bitmap.

The byte-per-base (B, L) uint8 batch costs 8 bits/base over the host->
device link; DNA carries 2.  Batches travel as 16-base uint32 words plus
a 32-base validity bitmap (3 bits/base, a 2.67x wire reduction) and are
unpacked on device by a fused elementwise stage in front of extraction
(VPU shifts — negligible next to the counting sorts).  The reference
faces the same volume question at its process<->disk boundary and packs
partition files to 2 bits/base (doc/paper.tex:104); this is that idea
applied to the TPU's ingest boundary.

Layout (row-major, LSB-first so unpack is a single shift):
  base i of a row  -> code word i // 16, bits 2*(i % 16)
  validity bit     -> bitmap word i // 32, bit i % 32
Invalid positions (PAD / split-at-invalid separators) pack code 0 with
validity 0; unpack restores exactly PAD there, so
``unpack(pack(codes)) == canonical(codes)`` where canonical maps every
invalid byte to PAD.  Rows whose length is not a multiple of 32 are
padded with invalid tail bits.
"""

from __future__ import annotations

import numpy as np

from dsk_tpu.io.batch import PAD


def packed_shapes(row_len: int) -> tuple[int, int]:
    """(code words, bitmap words) per row of ``row_len`` bases."""
    lpad = -(-row_len // 32) * 32
    return lpad // 16, lpad // 32


def pack_codes(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(B, L) uint8 codes -> ((B, ceil(L/16)) uint32 words,
    (B, ceil(L/32)) uint32 validity bitmap).

    Prefers the C packer (native.pack_batch, ~10x) — this runs per batch
    on the prefetch thread; the numpy path below is the lockstep-tested
    fallback."""
    from dsk_tpu.io import native

    out = native.pack_batch(codes)
    if out is not None:
        return out
    return pack_codes_numpy(codes)


def pack_codes_numpy(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy packer (normative reference for fx_pack_batch)."""
    B, L = codes.shape
    nw, nb = packed_shapes(L)
    lpad = nb * 32
    if lpad != L:
        full = np.full((B, lpad), PAD, np.uint8)
        full[:, :L] = codes
        codes = full
    valid = codes <= 3
    two = np.where(valid, codes, 0).astype(np.uint32)
    # or-reduce 16 shifted lanes into one word (vectorized over B*nw)
    lanes = two.reshape(B, nw, 16) << (2 * np.arange(16, dtype=np.uint32))
    words = np.bitwise_or.reduce(lanes, axis=2)
    vlanes = valid.reshape(B, nb, 32).astype(np.uint32) << np.arange(
        32, dtype=np.uint32
    )
    bitmap = np.bitwise_or.reduce(vlanes, axis=2)
    return words, bitmap


def unpack_codes_jnp(words, bitmap, row_len: int):
    """Device-side inverse of pack_codes: -> (B, row_len) uint8 codes
    with PAD at invalid positions.  Pure elementwise (XLA fuses it into
    the extraction stage); works under jit on any backend."""
    import jax.numpy as jnp

    # repeat (broadcast+reshape, no gather) each word across its bases,
    # then shift each base's bits down; slice off the 32-alignment tail
    w = jnp.repeat(words, 16, axis=-1)[..., :row_len]
    i = jnp.arange(row_len, dtype=jnp.uint32)
    codes = (w >> (2 * (i % 16))) & jnp.uint32(3)
    v = jnp.repeat(bitmap, 32, axis=-1)[..., :row_len]
    ok = (v >> (i % 32)) & jnp.uint32(1)
    return jnp.where(
        ok == 1, codes.astype(jnp.uint8), jnp.uint8(int(PAD))
    )
