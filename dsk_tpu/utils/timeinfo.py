"""Phase wallclock timers + run statistics.

Analog of gatb-core TimeInfo (SURVEY.md section 5.1: "Counted kmers time
Wallclock ... s" lines in doc/human_log:21-25) and the IProperties
run-info tree persisted into the output store (src/DSK.cpp:63-68).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class TimeInfo:
    """Named phase timers; accumulates wallclock seconds per phase."""

    def __init__(self):
        self.entries: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.entries[name] = self.entries.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def as_properties(self) -> dict:
        return {name: f"{secs:.3f}" for name, secs in self.entries.items()}


class Progress:
    """Verbose-gated progress lines (the Observer/Progress analog,
    SURVEY.md C13/C16; doc/human_log:5 'Pass 1/7, loop through reads')."""

    def __init__(self, verbose: int = 0, stream=None):
        import sys

        self.verbose = verbose
        self.stream = stream or sys.stderr

    def log(self, msg: str, level: int = 1) -> None:
        if self.verbose >= level:
            self.stream.write(msg + "\n")
            self.stream.flush()
