"""Tracing / timing helpers (the reference has none — SURVEY §5.1).

``trace`` wraps ``jax.profiler`` so a phase can be dumped for TensorBoard /
Perfetto; ``timed`` gives honest device timings (block_until_ready, warmup
call excluded) — the structured replacement for the reference's ad-hoc
wall-clock prints (``src/gigalens/jax/inference.py:204-207``).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gigalens-trace"):
    """Profiles the enclosed block: ``with trace('/tmp/t'): run_phase()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, repeats: int = 10, **kwargs):
    """Returns (mean_seconds, last_result) with compile excluded."""
    result = None
    for _ in range(max(warmup, 0)):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(repeats):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / repeats, result


class PhaseTimer:
    """Collects named phase wall-clocks; prints a one-line summary."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.phases.values())
        parts = " ".join(f"{k}={v:.1f}s" for k, v in self.phases.items())
        return f"{parts} total={total:.1f}s"
