"""Tracing / profiling hooks.

(reference: src/trace.rs:26-90 — trace_span!/trace_enter!/trace_event! macros
compiling to `tracing` spans under a feature flag, used for the renacer
profiler; plus Decoder::forward_traced per-stage L2 norms at decoder.rs:1655.)

TPU equivalents: ``jax.profiler`` traces + ``jax.named_scope`` per pipeline
step, enabled by env var or ``enable_tracing()``; and ``forward_traced`` in
model.traced for the numerical-debugging workhorse.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, List, Optional, Tuple

_ENABLED = os.environ.get("WHISPER_APR_TRACE", "") not in ("", "0", "false")
_EVENTS: List[Tuple[str, float, float]] = []  # (name, start, duration)


def enable_tracing(enabled: bool = True) -> None:
    global _ENABLED
    _ENABLED = enabled


def tracing_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Named scope + wall-time event (reference: trace.rs trace_span!).

    Inside jit traces this adds an XLA ``named_scope`` (visible in
    jax.profiler dumps); outside it records a host-side timing event.
    """
    if not _ENABLED:
        yield
        return
    import jax
    start = time.perf_counter()
    with jax.named_scope(name):
        yield
    _EVENTS.append((name, start, time.perf_counter() - start))


def trace_event(name: str) -> None:
    """Point event (reference: trace.rs trace_event!)."""
    if _ENABLED:
        _EVENTS.append((name, time.perf_counter(), 0.0))


def drain_events() -> List[Tuple[str, float, float]]:
    global _EVENTS
    ev, _EVENTS = _EVENTS, []
    return ev


@contextlib.contextmanager
def profile(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto
    (the analog of the reference's renacer Chrome traces, Makefile:308)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
