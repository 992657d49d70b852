"""Profiler tracing helpers.

TPU-side analogue of the reference's Instant::now() instrumentation points
(SURVEY.md §5 'Tracing / profiling'): wraps ``jax.profiler`` so a transform
can be traced into TensorBoard/XPlane format, plus named step annotations for
the host-stepped level loop.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block (no-op if the
    platform does not support profiling, e.g. some tunnelled backends)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def step_annotation(name: str):
    """Named annotation for one water level (shows up in trace viewers)."""
    import jax

    return jax.profiler.StepTraceAnnotation(name)
