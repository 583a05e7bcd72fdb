"""Primary-ray generation with thin-lens depth of field.

Mirrors the reference ray setup in
``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:364-411`` (single-focus
path): screen-space direction from an UNNORMALIZED right/up camera basis
(faithful to the reference, which skips the normalize), then a sunflower
aperture offset that pivots each sample ray about the focal point.

Pixel convention: row 0 = bottom of the image (GL image origin); writers
flip for PNG.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_tests_tpu.core import linalg, sampling
from raytracing_tests_tpu.scene.types import Camera

WORLD_UP = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def primary_rays(camera: Camera, width: int, height: int, spp: int):
    """Generate per-(pixel, sample) camera rays.

    Returns (origin, direction, time_ratio) each of shape (H, W, S, 3|).
    ``time_ratio = s / S`` is the motion-blur time coordinate the reference
    derives from ``gl_LocalInvocationIndex``.
    """
    aspect = width / height
    screen_dist = 1.0 / (2.0 * jnp.tan(camera.fov_y * 0.5))

    px = (jnp.arange(width, dtype=jnp.float32) / width - 0.5) * aspect  # (W,)
    py = jnp.arange(height, dtype=jnp.float32) / height - 0.5  # (H,)

    cam_right = linalg.cross(camera.direction, WORLD_UP)  # unnormalized, like ref
    cam_up = linalg.cross(cam_right, camera.direction)

    base_dir = (
        camera.direction * screen_dist
        + cam_right * px[None, :, None]
        + cam_up * py[:, None, None]
    )  # (H, W, 3)
    base_dir = linalg.normalize(base_dir)

    s = jnp.arange(spp, dtype=jnp.float32)  # (S,)
    offset = sampling.sunflower_disc(s, spp, camera.aperture)  # (S, 2)

    ray_right = linalg.cross(base_dir, WORLD_UP)  # (H, W, 3)
    ray_up = linalg.cross(ray_right, base_dir)

    new_tip = (
        camera.position
        + base_dir[..., None, :]
        + ray_right[..., None, :] * offset[:, 0, None]
        + ray_up[..., None, :] * offset[:, 1, None]
    )  # (H, W, S, 3)
    look_at = camera.position + base_dir * camera.focus_dist[0]
    d = linalg.normalize(look_at[..., None, :] - new_tip)
    o = new_tip - d

    time_ratio = jnp.broadcast_to(s / spp, o.shape[:-1])
    return o, d, time_ratio
