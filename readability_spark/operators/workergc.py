"""Python-worker GC tuning for allocation-heavy Arrow batch functions.

A parsed DOM or a pure-Python codec loop allocates tens of thousands of
GC-tracked containers per document; CPython's default gen0 threshold (700)
fires dozens of young-gen scans per doc over objects that all survive until
the doc completes — measured ~10% of per-doc wall on the extraction bench
corpus. Workers are reused across tasks, so the setting is applied once per
worker process and is idempotent. Callers that build large cyclic graphs
(the DOM) should still gc.collect() once per Arrow batch to bound floating
cyclic garbage; pure-numpy decoders don't need to (their buffers free by
refcount).
"""

from __future__ import annotations

import gc

_TUNED = False


def tune_worker_gc() -> None:
    """Raise GC thresholds in this worker process (idempotent)."""
    global _TUNED
    if not _TUNED:
        gc.set_threshold(200_000, 50, 50)
        _TUNED = True
