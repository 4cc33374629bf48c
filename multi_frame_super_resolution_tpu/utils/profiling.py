"""Profiling/tracing utilities.

The reference's observability is cv::TickMeter + Nsight hooks
(multi_frame_sr.cpp:176-206, main.cpp:333-339); the TPU equivalents are
``jax.profiler`` traces and named annotation scopes usable inside jitted
code.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace scope; usable around jitted calls:

        with annotate("align"):
            shifts = align_burst(gray)
    """
    return jax.profiler.TraceAnnotation(name)


def named(fn, name: str):
    """Wrap a function so its device execution shows under ``name`` in
    profiles."""
    return jax.named_scope(name)(fn)
