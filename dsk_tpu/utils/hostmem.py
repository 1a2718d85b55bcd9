"""Host allocator tuning for large-array numpy pipelines.

The counting pipeline allocates and frees many ~100 MB numpy temporaries
(batch stacking, window extraction, planner sampling).  glibc serves
allocations above MMAP_THRESHOLD with fresh mmap regions and unmaps them
on free, so every temporary re-page-faults its whole extent.  On this
VM class (Firecracker guests with lazy memory) faulting runs at
~100 MB/s — a single 100 MB temp costs ~1 s, and the planner's sampling
sweep measured 38-57 s of pure page-fault time (round 2).

mallopt(M_MMAP_MAX=0) forces large blocks onto the brk heap and
mallopt(M_TRIM_THRESHOLD=-1) keeps freed blocks cached there, so steady
state reuses already-faulted pages (measured: canonical_windows on a
12.6 M-base sample 38 s -> 13 s from this alone; the doubling rewrite in
kmer.codec removes most of the rest).  Cost: the process holds its peak
heap until exit — the right trade for a batch counting tool (the
reference pre-allocates its whole -max-memory budget up front for the
same reason, doc/paper.tex:104).
"""

from __future__ import annotations

import ctypes
import sys

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4

_done = False


def tune_malloc() -> bool:
    """Apply glibc mallopt tuning (idempotent). Returns True if applied."""
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        mallopt = libc.mallopt
        mallopt.argtypes = (ctypes.c_int, ctypes.c_int)
        mallopt.restype = ctypes.c_int
        ok1 = mallopt(_M_MMAP_MAX, 0)
        ok2 = mallopt(_M_TRIM_THRESHOLD, 2**30)
        _done = bool(ok1 and ok2)
        return _done
    except OSError:
        return False
