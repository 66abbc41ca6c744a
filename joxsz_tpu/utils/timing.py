"""Timing / profiling utilities (SURVEY.md §5.1 — the reference has none).

* ``Timer`` — simple wall-clock context manager accumulating named spans.
* ``Throughput`` — likelihood-evals/sec meter used by the fit driver.
* ``trace_annotation`` — wraps ``jax.profiler.TraceAnnotation`` so hot
  regions show up named in TPU profiles.
* ``profile_to`` — context manager around ``jax.profiler.trace`` for
  capturing a TensorBoard-compatible device profile of a fit phase.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    def __init__(self):
        self.spans: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": v, "calls": self.counts[k]}
                for k, v in sorted(self.spans.items())}


class Throughput:
    """Accumulates (evals, seconds) pairs; reports evals/sec."""

    def __init__(self):
        self.evals = 0
        self.seconds = 0.0

    def add(self, n_evals: int, seconds: float):
        self.evals += n_evals
        self.seconds += seconds

    @property
    def evals_per_s(self) -> float:
        return self.evals / self.seconds if self.seconds > 0 else float("nan")


def trace_annotation(name: str):
    """Named region for device profiles; no-op if the profiler is absent."""
    try:
        import jax.profiler

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device profile (open with TensorBoard / xprof)."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
