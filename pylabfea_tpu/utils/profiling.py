"""Tracing / profiling helpers.

The reference has only ad-hoc ``time.time()`` prints; here profiling is a
first-class utility: ``trace`` wraps a block in a ``jax.profiler`` trace
(viewable in TensorBoard/XProf or Perfetto), and ``StepTimer`` collects
per-load-step wall-clock and custom counters from the solvers.
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    """Record a jax.profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock and counter collection for incremental solvers.

    Usage::

        timer = StepTimer()
        for step in range(n):
            with timer.step():
                state, diag = load_step(...)
            timer.note(cg_iters=int(diag['cg_iters']))
        print(timer.summary())
    """

    def __init__(self):
        self.times = []
        self.notes = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def note(self, **counters):
        self.notes.append(counters)

    def summary(self):
        n = len(self.times)
        if n == 0:
            return {'steps': 0}
        total = sum(self.times)
        out = {'steps': n, 'total_s': total, 'mean_s': total / n,
               'max_s': max(self.times)}
        if self.notes:
            keys = self.notes[0].keys()
            for k in keys:
                vals = [d[k] for d in self.notes if k in d]
                out[f'{k}_mean'] = sum(vals) / len(vals)
                out[f'{k}_max'] = max(vals)
        return out
