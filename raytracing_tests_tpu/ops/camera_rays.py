"""Primary-ray generation with thin-lens depth of field.

Mirrors the reference ray setup in
``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:364-411`` (single-focus
path): screen-space direction from an UNNORMALIZED right/up camera basis
(faithful to the reference, which skips the normalize), then a sunflower
aperture offset that pivots each sample ray about the focal point.

Extras over the single reference kernel, both reference capabilities:
  - multi-focus: sample s focuses at ``focus_dist[s % K]`` (the
    ``u_NumOfFocusDist`` / ``#if MULTIFOCUS`` path, ``base.h:152-168``),
  - ``aa_grid``: per-sample screen jitter on the diagonal-scan supersampling
    grid (IOW-02, ``02_Groups/computeShaderSrc.glsl:135-157``),
  - orthographic projection (``GLCore/Util/OrthographicCamera.h:7-33``):
    parallel rays, selected when ``camera.ortho_height > 0`` (branchless,
    so the camera stays a plain traced pytree).

Pixel convention: row 0 = bottom of the image (GL image origin); writers
flip for PNG.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_tests_tpu.core import linalg, sampling
from raytracing_tests_tpu.scene.types import Camera

WORLD_UP = jnp.array([0.0, 1.0, 0.0], jnp.float32)


def primary_rays(camera: Camera, width: int, height: int, spp: int, aa_grid: bool = False):
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

    if aa_grid:
        cells, grid = sampling.supersample_grid_offsets(spp)  # (S, 2) ints
        jx = (jnp.asarray(cells[:, 0], jnp.float32) + 0.5) / grid - 0.5  # (S,)
        jy = (jnp.asarray(cells[:, 1], jnp.float32) + 0.5) / grid - 0.5
        px_s = px[None, :, None] + jx[None, None, :] / width * aspect  # (1, W, S)
        py_s = py[:, None, None] + jy[None, None, :] / height  # (H, 1, S)
        base_dir = (
            camera.direction * screen_dist
            + cam_right * px_s[..., None]
            + cam_up * py_s[..., None]
        )  # (H, W, S, 3)
        base_dir = linalg.normalize(base_dir)
        o, d, time_ratio = _dof_rays(camera, base_dir, spp)
        sx, sy = px_s[..., None], py_s[..., None]
    else:
        base_dir = (
            camera.direction * screen_dist
            + cam_right * px[None, :, None]
            + cam_up * py[:, None, None]
        )  # (H, W, 3)
        base_dir = linalg.normalize(base_dir)
        o, d, time_ratio = _dof_rays(camera, base_dir[..., None, :], spp)
        sx = jnp.broadcast_to(px[None, :, None, None], (height, width, 1, 1))
        sy = jnp.broadcast_to(py[:, None, None, None], (height, width, 1, 1))

    # Orthographic blend: parallel rays from a view-plane lattice.  Selected
    # per camera (scalar), branchless so the function stays jit-generic.
    right_n = linalg.normalize(cam_right)
    up_n = linalg.normalize(cam_up)
    h = camera.ortho_height
    o_ortho = camera.position + h * (sx * right_n + sy * up_n)
    d_ortho = jnp.broadcast_to(camera.direction, o.shape)
    is_ortho = h > 0.0
    o = jnp.where(is_ortho, jnp.broadcast_to(o_ortho, o.shape), o)
    d = jnp.where(is_ortho, d_ortho, d)
    return o, d, time_ratio


def _dof_rays(camera: Camera, base_dir, spp: int):
    """Thin-lens DOF for base directions (..., S | 1, 3) -> (H, W, S, 3)."""
    s = jnp.arange(spp, dtype=jnp.float32)
    offset = sampling.sunflower_disc(s, spp, camera.aperture)  # (S, 2)
    ray_right = linalg.cross(base_dir, jnp.broadcast_to(WORLD_UP, base_dir.shape))
    ray_up = linalg.cross(ray_right, base_dir)
    new_tip = (
        camera.position
        + base_dir
        + ray_right * offset[:, 0, None]
        + ray_up * offset[:, 1, None]
    )
    # Multi-focus: sample s focuses at focus_dist[s % K] (single-focus: K=1).
    fd = camera.focus_dist[(jnp.arange(spp) % camera.focus_dist.shape[0])]  # (S,)
    look_at = camera.position + base_dir * fd[:, None]
    d = linalg.normalize(look_at - new_tip)
    o = new_tip - d
    time_ratio = jnp.broadcast_to(s / spp, o.shape[:-1])
    return o, d, time_ratio
