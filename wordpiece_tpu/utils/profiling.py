"""Tracing / profiling: first-class per-stage counters + jax.profiler.

The reference has essentially no observability (an unused currentTs(),
SURVEY.md §5); timing lives in its Python harness.  Here profiling is a
first-class subsystem: any encoder can be handed a `StageStats` collector
that records wall time and throughput per pipeline stage (host segment,
pack, device dispatch, fetch, expand), and `trace()` wraps a region in a
jax.profiler trace for TPU timeline inspection.

Note on axon: `block_until_ready` does not actually block through the
tunnel, so device stages are timed around the host-visible fetch — the
only reliable sync point.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageStats:
    """Accumulates per-stage wall times and byte counts."""

    def __init__(self):
        self.times: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)
        self.bytes: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.calls[name] += 1
            self.bytes[name] += nbytes

    def report(self) -> dict:
        out = {}
        for name, t in sorted(self.times.items()):
            entry = {"seconds": round(t, 6), "calls": self.calls[name]}
            if self.bytes[name]:
                entry["bytes"] = self.bytes[name]
                entry["bytes_per_s"] = round(self.bytes[name] / t, 1) if t > 0 else None
            out[name] = entry
        return out

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)

    def reset(self) -> None:
        self.times.clear()
        self.calls.clear()
        self.bytes.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wordpiece_tpu_trace"):
    """jax.profiler trace region (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
