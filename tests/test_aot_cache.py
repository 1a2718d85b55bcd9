"""Two-level AOT executable cache: cold compile -> warm pointer load.

The cache exists because remote TPU compiles run to minutes and jax's
persistent compilation cache does not cover them (CLAUDE.md); these
tests pin its contract on the CPU backend: a second identical engine
loads every program (step, hist, live) without compiling, counts stay
oracle-exact through cached executables, and multi-chip engines bypass
the sharding-blind cached gather helpers.
"""

import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.dist.engine import DistCountEngine, default_mesh
from dsk_tpu.kmer import codec


def _engine(mesh_n):
    return DistCountEngine(
        27,
        mesh=default_mesh(mesh_n),
        batch_rows=16,
        row_len=64,
        table_cap=1 << 12,
    )


def test_cold_then_warm_single_chip(tmp_path, data_dir):
    uri = str(data_dir / "readN.fasta")
    cache = str(tmp_path / "aot")

    cold = []
    e1 = _engine(1)
    e1.compile(progress=cold.append, cache_dir=cache)
    res1 = e1.count(uri)

    warm = []
    e2 = _engine(1)
    e2.compile(progress=warm.append, cache_dir=cache)
    res2 = e2.count(uri)

    # cold run compiled (or HLO-deduped) every program; warm run loaded
    # all three (step, hist, live) straight from the fast pointer
    assert len(warm) == 3
    assert all(m.startswith("loaded") and "AOT cache" in m for m in warm), warm
    assert len(cold) == 3

    expected = oracle.count_bank(uri, 27)
    for res in (res1, res2):
        got = {
            codec.words_to_value(row): int(a)
            for row, a in zip(res.kmers, res.counts)
        }
        assert got == expected


def test_multichip_engine_gathers_after_compile(tmp_path, data_dir):
    """Cached executables are compiled from sharding-free avals, so the
    multi-chip gather must NOT route through them (regression: the AOT'd
    chunker rejected 8-chip NamedSharding tables)."""
    uri = str(data_dir / "readN.fasta")
    cache = str(tmp_path / "aot")

    msgs = []
    eng = _engine(8)
    eng.compile(progress=msgs.append, cache_dir=cache)
    # multi-chip compiles only step+hist; the live program stays a jit
    # wrapper (AOT avals carry no sharding)
    assert len(msgs) == 2
    res = eng.count(uri)

    expected = oracle.count_bank(uri, 27)
    got = {
        codec.words_to_value(row): int(a)
        for row, a in zip(res.kmers, res.counts)
    }
    assert got == expected


def test_source_edit_relinks_via_hlo_key(tmp_path, data_dir, monkeypatch):
    """A fast-key miss with an unchanged program must re-link through the
    HLO-content key instead of recompiling (pointer file rewritten)."""
    import os

    cache = str(tmp_path / "aot")
    e1 = _engine(1)
    e1.compile(progress=lambda m: None, cache_dir=cache)
    ptrs = sorted(p for p in os.listdir(cache) if p.endswith(".ptr"))
    assert len(ptrs) == 3

    # simulate a source edit: drop the pointer files, keep the .aotx
    for p in ptrs:
        os.remove(os.path.join(cache, p))
    msgs = []
    e2 = _engine(1)
    e2.compile(progress=msgs.append, cache_dir=cache)
    assert all("HLO key" in m for m in msgs), msgs
    # pointers restored for the next fully-warm start
    assert sorted(
        p for p in os.listdir(cache) if p.endswith(".ptr")
    ) == ptrs
