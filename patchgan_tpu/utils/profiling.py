"""Tracing / profiling hooks.

The reference's only observability is tqdm postfix strings (SURVEY.md
§5); here the Trainer can capture a real device profile: a
``jax.profiler`` trace of a chosen epoch (viewable in TensorBoard /
Perfetto) plus per-epoch wall-clock and throughput that the Trainer
prints by default.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir, enabled=True):
    """Context manager: jax.profiler trace into ``trace_dir`` when set."""
    if trace_dir and enabled:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Lightweight rolling step timer (host wall clock)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n=1):
        self.steps += n

    @property
    def elapsed(self):
        return time.perf_counter() - self._t0

    def rate(self, per=1):
        e = self.elapsed
        return (self.steps * per / e) if e > 0 else 0.0
