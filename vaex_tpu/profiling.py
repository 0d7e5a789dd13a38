"""Profiling helpers: per-pass stats + the JAX profiler.

The reference has no built-in tracer (SURVEY.md §5.1 — external asv only);
here every pass records rows/seconds/shards in `executor.pass_log`, and
`vaex_tpu.profiling.trace(...)` wraps a block in the JAX profiler for
TensorBoard-compatible device traces."""

from __future__ import annotations

import contextlib


def pass_stats(executor=None):
    """Recent per-pass execution stats."""
    from .execution import get_main_executor
    executor = executor or get_main_executor()
    return list(executor.pass_log)


@contextlib.contextmanager
def trace(logdir="/tmp/vaex_tpu_trace"):
    """Device-level profiler (XLA/TPU trace viewable in TensorBoard /
    Perfetto)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
