"""Phase timing + profiling.

Keeps the reference's phase taxonomy (SURVEY.md section 5: per-plan phases
"path+corridor" learning_planner.hpp:301-303, "inference" :191-194,
"qp+fill" :235-237, plus the model-load microbenchmark :115-135), as a
light context-manager API with JSONL output and an optional jax.profiler
trace for TPU timelines.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall-clock per named phase; prints/records like the
    reference's per-phase chrono spans."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def dump(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace for the enclosed region (TensorBoard-compatible)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def microbenchmark(fn, *args, warmup: int = 2, reps: int = 3) -> float:
    """Model-load style microbenchmark (learning_planner.hpp:91-135: two
    warm-ups then a timed pass). Returns mean seconds over reps."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps
