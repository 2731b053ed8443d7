"""Profiling / tracing hooks.

The reference has no profiling beyond tqdm (SURVEY.md section 5). Here:
- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-viewable XLA trace of the enclosed steps;
- ``annotate(name)``: TraceAnnotation for named host-side regions;
- ``step_timer``: wall-clock images/sec accounting (core.logging.StepTimer).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA/device trace for everything inside the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
