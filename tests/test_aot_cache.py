"""AOT compile + persistent-cache contract.

Round-2 history: an earlier design cached SERIALIZED executables
(jax.experimental.serialize_executable).  On the axon remote-compile
backend a deserialized executable pays a ~full recompile at its FIRST
EXECUTION (216-244 s measured) — the cache only moved the cost out of
compile() and into the stream.  jax's persistent compilation cache
covers remote compiles properly (67 s -> ~1 s restore, fast first
execute), so engine.compile() now AOT-lowers location-free and lets the
persistent cache serve warm starts.  These tests pin that contract on
the CPU backend: compile() swaps wrappers for executables, counts stay
oracle-exact through them, repeated compiles work, and the cache
configuration respects user overrides.
"""

import numpy as np
import pytest

from dsk_tpu import oracle
from dsk_tpu.dist.engine import (
    DistCountEngine,
    _enable_persistent_cache,
    default_mesh,
)
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
    cache = str(tmp_path / "xla")

    cold = []
    e1 = _engine(1)
    e1.compile(progress=cold.append, cache_dir=cache)
    res1 = e1.count(uri)

    warm = []
    e2 = _engine(1)
    e2.compile(progress=warm.append, cache_dir=cache)
    res2 = e2.count(uri)

    # all three programs (step, hist, live) AOT-compiled both times; the
    # persistent cache (not a bespoke executable store) makes run 2 warm
    assert len(cold) == 3 and len(warm) == 3
    assert all(m.startswith("compiled") for m in cold + warm), (cold, warm)

    expected = oracle.count_bank(uri, 27)
    for res in (res1, res2):
        got = {
            codec.words_to_value(row): int(a)
            for row, a in zip(res.kmers, res.counts)
        }
        assert got == expected


def test_multichip_engine_gathers_after_compile(tmp_path, data_dir):
    """Compiled helpers are built from sharding-free avals, so the
    multi-chip gather must NOT route through them (regression: the AOT'd
    chunker rejected 8-chip NamedSharding tables)."""
    uri = str(data_dir / "readN.fasta")
    cache = str(tmp_path / "xla")

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


def test_persistent_cache_respects_user_config(tmp_path, monkeypatch):
    """DSK_TPU_AOT_CACHE=0 disables; an existing jax_compilation_cache_dir
    is left alone; an explicit cache_dir wins."""
    import jax

    import dsk_tpu.dist.engine as eng_mod

    monkeypatch.setattr(eng_mod, "_PCACHE_ENABLED", False)
    before = jax.config.jax_compilation_cache_dir

    monkeypatch.setenv("DSK_TPU_AOT_CACHE", "0")
    _enable_persistent_cache()
    assert jax.config.jax_compilation_cache_dir == before

    monkeypatch.delenv("DSK_TPU_AOT_CACHE", raising=False)
    mine = str(tmp_path / "mine")
    _enable_persistent_cache(mine)
    assert jax.config.jax_compilation_cache_dir == mine

    # default call after a user/config value is present: keep it
    _enable_persistent_cache()
    assert jax.config.jax_compilation_cache_dir == mine
