"""Tracing / profiling utilities (aux subsystem the reference lacks —
SURVEY.md section 5.1 lists tqdm postfixes as its only instrumentation).

* `stage_timer`: lightweight wall-clock scopes with a process-wide
  registry, used by the pipeline runners.
* `device_trace`: context manager around `jax.profiler` emitting a
  TensorBoard-loadable trace of the device timeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

_TIMINGS: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def stage_timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name].append(time.perf_counter() - t0)


def timing_report(reset: bool = False) -> dict[str, dict]:
    out = {}
    for name, vals in _TIMINGS.items():
        out[name] = {
            "calls": len(vals),
            "total_s": sum(vals),
            "mean_s": sum(vals) / len(vals),
            "max_s": max(vals),
        }
    if reset:
        _TIMINGS.clear()
    return out


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
