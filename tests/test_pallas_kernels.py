"""Parity tests for the Pallas TPU extraction kernel (interpret mode).

The production TPU path (extract_canonical_planes_tpu) must agree with the
jnp reference (extract_canonical_planes_jnp) bit-for-bit — the reference
pins extraction semantics via test/short.parse_results and test/readN.histo
(/root/reference/scripts/simple_test.sh:88-125).  Run with interpret=True
so the kernel math is exercised on the CPU suite; the same program runs
compiled on real TPU (scripts/tpu_smoke.py).
"""

import numpy as np
import pytest

from dsk_tpu.kmer.pallas_kernels import (
    extract_canonical_planes_jnp,
    extract_canonical_planes_tpu,
)

# k values crossing every word-split regime: W=1 (k=15,16), W=2 with
# r<16 (k=21,27,31), r=16 (k=32), W=3 r=1 (k=33), W=4 r=15/16 (k=63,64),
# W=5 r=1 (k=65).
KS = [15, 16, 21, 27, 31, 32, 33, 63, 64, 65]


def _rand_batch(rng, B, L, invalid_frac=0.0):
    batch = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    if invalid_frac:
        bad = rng.random((B, L)) < invalid_frac
        batch = np.where(bad, np.uint8(4), batch)
    return batch


def _check(batch, k):
    planes_p, valid_p = extract_canonical_planes_tpu(batch, k, interpret=True)
    planes_j, valid_j = extract_canonical_planes_jnp(batch, k)
    np.testing.assert_array_equal(np.asarray(valid_p), np.asarray(valid_j))
    np.testing.assert_array_equal(np.asarray(planes_p), np.asarray(planes_j))


@pytest.mark.parametrize("k", KS)
def test_pallas_matches_jnp_random(k):
    rng = np.random.default_rng(k)
    _check(_rand_batch(rng, 8, 256), k)


@pytest.mark.parametrize("k", [21, 31, 33, 63])
def test_pallas_matches_jnp_invalid_chars(k):
    rng = np.random.default_rng(100 + k)
    _check(_rand_batch(rng, 8, 256, invalid_frac=0.05), k)


@pytest.mark.parametrize("L", [128, 256, 1024])
def test_pallas_matches_jnp_row_lengths(L):
    rng = np.random.default_rng(L)
    _check(_rand_batch(rng, 4, L, invalid_frac=0.02), 31)


def test_pallas_palindrome_and_homopolymer():
    # fwd == rc ties (even-k palindromes) and G-runs (canonical(G^k)=C^k,
    # exercising the word0 high-bit paths)
    k = 32
    row_g = np.full((1, 128), 3, np.uint8)          # GGGG...
    row_pal = np.tile(np.array([0, 2], np.uint8), 64)[None, :]  # ATAT...
    _check(np.concatenate([row_g, row_pal], axis=0), k)
