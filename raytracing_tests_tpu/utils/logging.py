"""Structured logging + per-step metrics.

The TPU-native stand-in for the reference's spdlog singleton
(``GLCore/Core/Log.{h,cpp}``) and its ImGui live-metric panels: a std
``logging`` logger with the reference's colored level scheme, plus a tiny
metrics recorder for rays/s style counters.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict

_FMT = "[%(asctime)s] %(name)s: %(message)s"


def get_logger(name: str = "rt-tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class Metrics:
    """Accumulates named scalar series (rays/s, step time, scaling efficiency)."""

    def __init__(self):
        self.series = defaultdict(list)

    def record(self, name: str, value: float):
        self.series[name].append(float(value))

    def last(self, name: str):
        return self.series[name][-1] if self.series[name] else None

    def summary(self) -> dict:
        return {
            k: {"last": v[-1], "mean": sum(v) / len(v), "n": len(v)}
            for k, v in self.series.items()
            if v
        }


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
