"""Scene representation: HBM-resident SoA, cameras, textures, noise, remaps."""

from raytracing_tests_tpu.scene.types import Camera, Scene, SceneBuilder  # noqa: F401
