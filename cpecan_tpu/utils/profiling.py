"""Profiling hooks (SURVEY §5: the reference has none; first-class here).

- `trace(log_dir)`: context manager around jax.profiler.trace — captures a
  full XLA/TPU trace viewable in TensorBoard/xprof/Perfetto.
- `annotate(name)`: jax.profiler.TraceAnnotation wrapper for labeling host
  regions inside a trace.
- `Timer`: lightweight named wall-clock accumulator for host-side phases
  (band prep, IO, kernel dispatch), independent of the jax profiler.
"""

import time
from collections import defaultdict
from contextlib import contextmanager


@contextmanager
def trace(log_dir, create_perfetto_link=False):
    import jax
    with jax.profiler.trace(log_dir,
                            create_perfetto_link=create_perfetto_link):
        yield


def annotate(name):
    import jax
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulates wall time per named section; report() returns
    {name: (seconds, calls)}."""

    def __init__(self):
        self._acc = defaultdict(float)
        self._n = defaultdict(int)

    @contextmanager
    def section(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._n[name] += 1

    def report(self):
        return {k: (self._acc[k], self._n[k]) for k in self._acc}

    def summary(self):
        rows = sorted(self.report().items(), key=lambda kv: -kv[1][0])
        return "\n".join(f"{k}: {s:.4f}s over {n} calls"
                         for k, (s, n) in rows)
