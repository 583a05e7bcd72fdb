"""Renderer ops: the jit wavefront path tracer and supporting image ops."""

from raytracing_tests_tpu.ops.render import RenderConfig, render  # noqa: F401
