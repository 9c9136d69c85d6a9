"""Stage tracing: KS265_TRACE_STAGES=1 prints per-stage wall times of the
hot encode/decode pipeline to stderr and accumulates totals.

The reference ships a compiled-in profiler (encoder stat rows + VTune
markers, SURVEY.md 5.1); here a zero-dependency context manager serves the
same role for the device pipeline, where the interesting stages are
dispatch vs blocking-fetch vs host syntax. Overhead when disabled: one dict
lookup per stage enter (no perf_counter call).
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from contextlib import contextmanager

enabled = bool(os.environ.get("KS265_TRACE_STAGES"))
totals: dict[str, float] = defaultdict(float)
counts: dict[str, int] = defaultdict(int)


@contextmanager
def stage(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        totals[name] += dt
        counts[name] += 1
        print("[stage] %-28s %7.1f ms" % (name, dt * 1e3),
              file=sys.stderr, flush=True)


def report() -> str:
    lines = ["%-28s %8.2f s  x%d" % (k, totals[k], counts[k])
             for k in sorted(totals, key=lambda k: -totals[k])]
    return "\n".join(lines)


def reset() -> None:
    totals.clear()
    counts.clear()
