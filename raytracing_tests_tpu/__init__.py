"""raytracing_tests_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas reimagining of the capability set of the
reference OpenGL compute-shader sandbox ``ishanshLal-tRED/Raytracing-tests``
(Ray Tracing in One Weekend / The Next Week on the GPU): per-pixel ray
generation with depth of field, ellipsoid/cuboid intersection with per-object
inverse-rotation transforms, lambertian/metal/dielectric scattering with
Schlick reflectance, supersampling with in-kernel sample reduction, tiled
progressive rendering, motion blur, Morton-sorted LBVH build + traversal,
image/noise/cube-sphere textures with mercator<->cubic remapping, and emissive
area lights with shadow rays.

Architecture (TPU-first, not a port):
  - ``core/``      pure-jnp math: rays, intersections, normals, sampling.
  - ``scene/``     HBM-resident scene SoA, cameras, textures, noise, remaps.
  - ``bvh/``       on-device LBVH (Morton sort + Karras linking) + traversal.
  - ``reference/`` CPU oracle renderer (clarity over speed) for allclose tests.
  - ``ops/``       the jit wavefront renderer (bounded ray-queue bounce loop),
                   blur, APT expression evaluation.
  - ``kernels/``   Pallas TPU megakernels for the hot paths.
  - ``diff/``      differentiable rendering (soft visibility, custom VJP).
  - ``parallel/``  device-mesh sharding of image tiles; gradient collectives.
  - ``models/``    the workload registry mirroring the reference's tests.
  - ``app/``       CLI and framework face; ``utils/`` config/logging/io.
"""

__version__ = "0.1.0"

from raytracing_tests_tpu.scene.types import (  # noqa: F401
    Camera,
    Scene,
    ELLIPSOID,
    CUBOID,
)
