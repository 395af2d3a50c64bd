"""Profiling and benchmark helpers.

The reference had only wall-clock timing scattered through benchmarks
(reference: tests/run_tests.py:264-329, dashboard/mmap_embedding_loader.py
stats). Here: structured jax.profiler traces plus a reusable
latency/throughput harness that keeps the reference's
"samples/sec + ms/sample" report format.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(
    fn: Callable[[], Any],
    iters: int = 100,
    warmup: int = 10,
    samples_per_call: int = 1,
) -> Dict[str, float]:
    """Latency/throughput harness (reference: tests/run_tests.py:264-329).

    fn must block on its result (call jax.block_until_ready inside or
    return a jax array, which we block on here).
    """
    out = None
    for _ in range(warmup):
        out = fn()
    if out is not None:
        _block(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        _block(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    total = times.sum()
    return {
        "iters": iters,
        "samples_per_sec": samples_per_call * iters / total,
        "ms_per_sample": 1000.0 * total / (iters * samples_per_call),
        "p50_ms": float(np.percentile(times, 50) * 1000),
        "p90_ms": float(np.percentile(times, 90) * 1000),
        "p99_ms": float(np.percentile(times, 99) * 1000),
    }


def _block(out) -> None:
    try:
        jax.block_until_ready(out)
    except Exception:
        pass


class StepTimer:
    """Per-step timing accumulator for training loops."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._times = []
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1000),
            "p50_ms": float(np.percentile(t, 50) * 1000),
        }
