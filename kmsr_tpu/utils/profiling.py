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


def bench_windows(fn, *args, iters: int, windows: int = 5,
                  drain=None) -> dict:
    """Median-of-k timing windows with min/max spread.

    Tunnel/host throughput drifts ~15% across hours (docs/NOTES_r2.md),
    so a single sample makes cross-round deltas uninterpretable; every
    bench script reports {median_s, min_s, max_s} per iteration from k
    back-to-back windows instead (VERDICT r2 item 4). `drain` fences the
    in-order device queue (a scalar readback — block_until_ready does
    not round-trip under the remote-tunnel backend); defaults to a
    jnp.sum readback.
    """
    import jax.numpy as jnp

    if drain is None:
        def drain(o):
            return float(jnp.sum(o))

    drain(fn(*args))  # compile
    for _ in range(2):
        out = fn(*args)
    drain(out)  # warm queue
    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain(out)
        samples.append((time.perf_counter() - t0) / iters)
    samples.sort()
    return {
        "median_s": samples[len(samples) // 2],
        "min_s": samples[0],
        "max_s": samples[-1],
    }


def detect_sync_stall(
    scopes: dict[str, dict],
    stage_seconds: dict[str, float] | None = None,
    ratio: float = 5.0,
    floor_s: float = 120.0,
) -> list[dict]:
    """Flag stages whose main-thread device-sync time dwarfs their host work.

    A wedged remote device (tunnel stall) shows up as a stage spending
    nearly all its wall time blocked in `<stage>.device_sync` while its
    host scopes stay tiny — the r4 incident recorded
    `factory.device_sync` = 555.95 s in a stage a healthy session runs
    in 98.8 s, and that wedged JSON silently became the committed
    artifact (VERDICT r4 item 1). This detector makes such sessions
    self-disqualifying: a stage is flagged when

        device_sync > max(ratio * host_s, floor_s)

    where `host_s` sums the stage's other MAIN-THREAD scopes (`*_bg`
    reader-thread scopes overlap device compute and are excluded).
    `floor_s` absorbs legitimate first-compile time (~20-40 s through
    the tunnel) and honest queue drains so short clean runs never
    false-positive. Returns one record per flagged stage; callers mark
    their report `"tainted": true` when non-empty.
    """
    stage_seconds = stage_seconds or {}
    prefixes = sorted({n.split(".", 1)[0] for n in scopes if "." in n})
    flags = []
    for stage in prefixes:
        sync = scopes.get(f"{stage}.device_sync", {}).get("total_s", 0.0)
        host = sum(
            rec.get("total_s", 0.0)
            for name, rec in scopes.items()
            if name.startswith(stage + ".")
            and not name.endswith("device_sync")
            and not name.endswith("_bg")
        )
        if sync > max(ratio * host, floor_s):
            flags.append({
                "stage": stage,
                "device_sync_s": round(sync, 2),
                "host_s": round(host, 2),
                "wall_s": round(stage_seconds.get(stage, float("nan")), 2),
                "sync_to_host_ratio": round(sync / host, 1) if host else None,
            })
    return flags


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
