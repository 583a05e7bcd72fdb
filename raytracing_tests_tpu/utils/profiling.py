"""Tracing/profiling: jax.profiler wrappers + throughput counters.

The reference's closest artifacts are a frame Timestep and ImGui capability
readouts (SURVEY.md §5); the TPU framework exposes real tools: on-demand
XLA profiler traces (viewable in TensorBoard/Perfetto) and a rays/s meter.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rt_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed block.

    View with: tensorboard --logdir <log_dir>  (or upload to Perfetto).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Accumulates (rays, seconds) across frames; reports Mrays/s."""

    def __init__(self):
        self.rays = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def frame(self, rays: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.rays += int(rays)

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0


def annotate(name: str):
    """Named region for profiler traces (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
