"""Profiling: structured stage timers (utils/reporting.StageTimer) plus
optional XLA/TPU profiler traces.

The reference's only instrumentation is ad-hoc perf_counter prints
(sa_nsga_penalty.py:537-542,602-603; sa_nsga_local.py:452-467). Here:

* every driver stage logs {stage, seconds, ...} JSONL records via
  StageTimer;
* ``trace()`` wraps a stage in a jax.profiler trace (viewable in
  TensorBoard / xprof) when a trace directory is configured — set
  CMOOP_TRACE_DIR or pass trace_dir explicitly;
* ``device_memory_stats()`` snapshots per-device HBM usage for leak checks.
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """Profile a stage with jax.profiler when a trace dir is configured;
    otherwise a no-op."""
    import jax

    trace_dir = trace_dir or os.environ.get("CMOOP_TRACE_DIR")
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace (cheap; safe without a trace)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats() -> Dict[str, Dict]:
    """Per-device memory statistics (bytes_in_use etc.) where the backend
    exposes them; empty dict entries otherwise."""
    import jax

    out: Dict[str, Dict] = {}
    for d in jax.devices():
        try:
            out[str(d)] = dict(d.memory_stats() or {})
        except Exception:
            out[str(d)] = {}
    return out
