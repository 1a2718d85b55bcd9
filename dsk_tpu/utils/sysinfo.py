"""Host/device resource probing.

The analog of gatb-core SystemInfo / FileSystem free-space probing
(SURVEY.md C14; the reference auto-configures memory/disk from the
machine: doc/human_log:3-4, README.md:130).  Drives the planner's
defaults when the user gives no -max-memory / -max-disk.
"""

from __future__ import annotations

import os
import shutil


def total_ram_mb() -> int:
    """Total system RAM in MB (sysconf; 0 if undeterminable)."""
    try:
        return (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) >> 20
    except (ValueError, OSError, AttributeError):  # pragma: no cover
        return 0


def free_disk_mb(path: str = ".") -> int:
    """Free disk space at path in MB."""
    try:
        return shutil.disk_usage(path).free >> 20
    except OSError:  # pragma: no cover
        return 0


def n_cores() -> int:
    return os.cpu_count() or 1


def device_memory_mb() -> int:
    """Per-device accelerator memory in MB (HBM on TPU; 0 if unknown).

    jax exposes memory_stats() on real devices; the CPU backend has none.
    """
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit", 0)
        return int(limit) >> 20
    except Exception:
        return 0


def auto_limits(out_tmp: str | None = None) -> dict:
    """Default resource limits, reference-style auto-detection.

    memory: device HBM if known else 1/2 host RAM; disk: a fraction of
    free space at the spill dir (the reference uses free-disk fractions,
    README.md:130).
    """
    mem = device_memory_mb()
    if mem <= 0:
        mem = max(total_ram_mb() // 2, 1000)
    disk = free_disk_mb(out_tmp or ".") // 2
    return {
        "max_memory_mb": mem,
        "max_disk_mb": disk,
        "nb_cores": n_cores(),
        "total_ram_mb": total_ram_mb(),
    }
