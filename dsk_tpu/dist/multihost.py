"""Multi-host (multi-process) runtime scaffolding.

The reference is single-process; its cross-"partition" transport is the
local filesystem (SURVEY.md section 2.4).  The TPU replacement spans a
pod slice: one Python process per host, `jax.distributed` for the
runtime, a global mesh over every chip, and host-sharded input (each
process reads a distinct subset of the bank — the composite-bank analog).

Single-host engines work unchanged on a multi-host mesh ONLY if arrays
are built with process-local data (jax.make_array_from_process_local_data)
— plain device_put of a full batch would require the data on every host.

Recipe (one process per host):

    from dsk_tpu.dist import multihost
    multihost.initialize(coordinator="host0:8476", num_processes=N,
                         process_id=i)          # or rely on TPU env vars
    bank = multihost.shard_bank(open_bank(uri)) # this host's file subset
    eng = DistCountEngine(k, mesh=default_mesh())  # global mesh
    ...

Status: the input-sharding helpers below are exercised by unit tests; the
full multi-host count loop needs a real multi-process run (the CI
environment is single-process) and lands with the engine integration in
a later round.  SURVEY.md section 4.5's CPU-mesh simulation covers the
sharding/collective logic of the engine itself.
"""

from __future__ import annotations

import jax

from dsk_tpu.io.bank import Bank


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize wrapper (no-op if already initialized
    or single-process with no coordinator given)."""
    if jax.process_count() > 1:
        return
    if coordinator is None and num_processes is None:
        # TPU pod env (TPU_WORKER_HOSTNAMES etc.) lets jax auto-detect;
        # nothing to do on a single host.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_bank(
    bank: Bank,
    process_id: int | None = None,
    num_processes: int | None = None,
) -> Bank:
    """This host's sub-bank: files are dealt round-robin across processes
    (each host gunzips/parses only its share — the reference's composite
    bank split across one machine's threads becomes a split across hosts).

    Sub-bank ids are preserved globally: bank_id of a file equals its
    index in the ORIGINAL bank, so per-bank counting stays correct.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    files = [f for i, f in enumerate(bank.files) if i % n == pid]
    shard = Bank(uri=bank.uri, files=files)
    shard.global_ids = [i for i in range(len(bank.files)) if i % n == pid]
    return shard
