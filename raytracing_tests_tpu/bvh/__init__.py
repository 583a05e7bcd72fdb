"""On-device LBVH: Morton-sorted build + stackless traversal.

TPU-native re-design of the reference's CPU LBVH
(``In-Next-Week/LBVH/lbvh.h``): the build is fully jitted jax (runs on
device, amortizing the reference's per-frame CPU rebuild bottleneck,
``base.h:135-143``) and the traversal replaces the GLSL 40-float stack
(``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:80-108``) with a
stackless parent-link state machine that runs in lockstep across lanes.
"""

from raytracing_tests_tpu.bvh.build import LBVH, build_lbvh  # noqa: F401
from raytracing_tests_tpu.bvh.traverse import (  # noqa: F401
    traverse_nearest,
    traverse_nearest_obj,
)
