"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference had only ad-hoc CUDA-event timing in its benchmarks; here
profiling is a subsystem: jax.profiler traces (TensorBoard/Perfetto format),
named scopes per layer, and XLA flags for the latency-hiding scheduler that
overlaps collectives with the int8 matmuls (SURVEY.md §5.8).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

# XLA:TPU flags enabling async collectives + latency-hiding scheduling so
# TP all-reduces overlap with the surrounding qmatmuls. Set before backend
# init (e.g. exported by the serve CLI).
OVERLAP_XLA_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true "
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true "
    "--xla_tpu_overlap_compute_collective_tc=true "
    "--xla_enable_async_all_gather=true "
    "--xla_enable_async_collective_permute=true"
)


def enable_overlap_flags():
    """Append collective-overlap flags to XLA_FLAGS (call before jax use).

    Existing flags win: a flag is only appended if its exact name is not
    already present (name comparison, not substring — flag names prefix each
    other)."""
    flags = os.environ.get("XLA_FLAGS", "")
    existing = {f.split("=")[0] for f in flags.split() if f}
    for f in OVERLAP_XLA_FLAGS.split():
        if f.split("=")[0] not in existing:
            flags = f"{flags} {f}".strip()
    os.environ["XLA_FLAGS"] = flags


@contextlib.contextmanager
def trace(logdir: str = "/tmp/protoquant_trace"):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named scope visible in profiler timelines."""
    with jax.named_scope(name):
        yield


class StepTimer:
    """Host-side ring-buffer step timer (engine integration point)."""

    def __init__(self, capacity: int = 512):
        from collections import deque

        self.samples = deque(maxlen=capacity)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.append(time.perf_counter() - t0)

    def percentile(self, p: float) -> float:
        if not self.samples:
            return 0.0
        s = sorted(self.samples)
        return s[min(len(s) - 1, int(p * len(s)))]

    def summary_ms(self) -> dict:
        return {
            "p50": 1e3 * self.percentile(0.5),
            "p90": 1e3 * self.percentile(0.9),
            "p99": 1e3 * self.percentile(0.99),
            "n": len(self.samples),
        }
