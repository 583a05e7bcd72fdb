"""Failure handling: retry-on-transient-device-error + keep-last-good.

The reference's only graceful-degradation behaviors are "keep the old shader
program when the new one fails to compile" (``utility.cpp:49-63``,
``base.h:99-113``) and a file-dialog fallback for missing textures
(SURVEY.md §5).  The TPU equivalents:

  - jit/trace errors surface at compile time (nothing to recover — fix the
    config), but TPU runtime errors (preemption, transient device faults)
    deserve bounded retries;
  - ``KeepLastGood`` mirrors the shader-reload semantics for parameter
    updates during optimization: a step that produces non-finite results is
    discarded and the previous state kept.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

import jax

from raytracing_tests_tpu.utils.logging import get_logger

T = TypeVar("T")

_TRANSIENT_MARKERS = ("UNAVAILABLE", "RESOURCE_EXHAUSTED", "ABORTED", "INTERNAL")


def retry_on_device_error(
    fn: Callable[..., T], retries: int = 2, backoff_s: float = 1.0
) -> Callable[..., T]:
    """Wrap a device-executing callable with bounded retries on transient
    runtime errors (device faults / preemptions), re-raising anything that
    looks deterministic (shape errors, tracing errors) immediately."""
    log = get_logger()

    def wrapped(*args, **kw):
        attempt = 0
        while True:
            try:
                return fn(*args, **kw)
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                transient = any(m in msg for m in _TRANSIENT_MARKERS)
                if not transient or attempt >= retries:
                    raise
                attempt += 1
                log.warning(
                    "transient device error (attempt %d/%d): %s",
                    attempt, retries, msg.splitlines()[0],
                )
                time.sleep(backoff_s * attempt)

    return wrapped


class KeepLastGood:
    """Keep the previous state when an update produces non-finite values —
    the reference's keep-old-program-on-failed-compile, for train steps.

    Usage::
        guard = KeepLastGood(state)
        state, loss = guard.step(lambda s: step_fn(s, target))
    """

    def __init__(self, state):
        self.state = state
        self.rejected = 0

    def step(self, fn):
        import numpy as np

        new_state, *rest = fn(self.state)
        finite = all(
            bool(np.all(np.isfinite(x)))
            for x in jax.tree_util.tree_leaves(new_state)
            if hasattr(x, "dtype") and np.issubdtype(x.dtype, np.floating)
        )
        if finite:
            self.state = new_state
        else:
            self.rejected += 1
        return (self.state, *rest)
