"""Device-mesh parallelism: image-tile sharding + gradient collectives.

The reference is single-process/single-GPU; its scalability mechanisms are a
spiral tile scheduler with bounded work per dispatch
(``materials.cpp:100-120``, ``base2.h:329-381``) and a samples-per-workgroup
axis (``01_BVH glsl:642-673``).  The TPU-native architecture replaces them
with a ``jax.sharding.Mesh``: image rows interleave-shard across chips (the
spiral becomes a strided assignment so sky rows and geometry rows balance),
the scene/BVH replicate per chip, and scene-parameter gradients ``psum`` over
ICI (SURVEY.md §2.6).
"""

from raytracing_tests_tpu.parallel.mesh import make_mesh, row_permutation  # noqa: F401
from raytracing_tests_tpu.parallel.render_sharded import (  # noqa: F401
    render_sharded,
    render_sharded_jit,
)
