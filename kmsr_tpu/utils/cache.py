"""Persistent XLA compilation cache for the pipeline CLIs.

Every stage CLI jit-compiles at least one nontrivial program, and on this
deployment target the first compile in a fresh process is expensive (the
axon-tunnelled remote_compile measures 200-390 s cold, seconds warm —
docs/NOTES_r2.md). The reference has no equivalent concern (PyTorch eager),
so this is framework infrastructure, not parity: with the cache enabled,
re-running a stage (or resuming `run_all` after a crash) skips recompiles
entirely — XLA keys entries by HLO + compile options + backend, so a cache
hit is exactly the program that would have been built.

Opt-out / relocation via environment:
  KMSR_CACHE=0          disable entirely
  KMSR_CACHE_DIR=PATH   cache directory (default ~/.cache/kmsr_tpu/xla)
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/kmsr_tpu/xla"


def enable_persistent_cache(
    cache_dir: str | None = None, min_compile_secs: float = 1.0
) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the cache dir in use, or None when disabled (KMSR_CACHE=0 or
    an unwritable directory — a CLI must never fail because caching is
    unavailable). Safe to call more than once and before/after jax import;
    only programs whose compile takes >= min_compile_secs are persisted,
    so test-sized CPU programs don't churn the directory.
    """
    if os.environ.get("KMSR_CACHE", "1") == "0":
        return None
    cache_dir = os.path.expanduser(
        cache_dir or os.environ.get("KMSR_CACHE_DIR") or _DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    # makedirs(exist_ok=True) succeeds on an existing read-only directory;
    # verify writability so an unwritable dir cleanly disables the cache
    # instead of emitting a JAX cache-write warning on every compile.
    if not os.access(cache_dir, os.W_OK):
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return cache_dir
