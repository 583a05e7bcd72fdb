"""Pure-jnp math primitives: rays, intersections, normals, sampling."""

from raytracing_tests_tpu.core import geometry, linalg, sampling  # noqa: F401
