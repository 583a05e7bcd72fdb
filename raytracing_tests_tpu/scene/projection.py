"""Mercator (equirectangular) <-> cubic (cube-sphere atlas) reprojection.

TPU-native replacement for the reference's CPU remapping done on 4
``std::async`` threads (``Helper::TEXTURE_2D::LoadFromDiskToGPU``,
``utility.cpp:253-487``): one fused gather over the whole output grid.

Conventions (matching the reference exactly):
  - MERCATOR: U in [0,1) wraps yaw (atan2(z, x) / 2pi, negative wrapped up);
    V in [0,1] is acos(-y)/pi (V=0 at -y pole).
  - CUBIC: a (H, 6W) atlas, face order [+y, +x, +z, -x, -z, -y]; per-face
    texcoords follow the table in ``cube_sphere_uv``
    (``03_Solid.../computeShaderSrc.glsl:387-407``).

The reference samples nearest-neighbor (integer truncation in
``pixelLoad``); ``bilinear=True`` is offered for quality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

FACES = 6


def _face_uv_to_dir(face, u, v):
    """(face, u, v in [0,1]) -> unnormalized direction (x, y, z).

    Inverts the cube_sphere_uv table; mirrors the reference's switch
    (``utility.cpp:310-343``: build ``front`` in [0,1]^3 then subtract 0.5).
    """
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    # front components in [0,1] per face (reference table).
    fx = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [u, ones, u, zeros, 1.0 - v, 1.0 - v],
    )
    fy = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [ones, 1.0 - u, v, v, 1.0 - u, zeros],
    )
    fz = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [1.0 - v, 1.0 - v, ones, u, zeros, u],
    )
    return jnp.stack([fx - 0.5, fy - 0.5, fz - 0.5], axis=-1)


def _dir_to_mercator_uv(d):
    """Direction -> (U, V) in [0,1] (reference ``XYtoUVCoord`` tail,
    ``utility.cpp:344-349``)."""
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    v = jnp.arccos(jnp.clip(-d[..., 1], -1.0, 1.0)) / np.pi
    u = jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * np.pi)
    u = jnp.where(u < 0, u + 1.0, u)
    return u, v


def _mercator_uv_to_dir(u, v):
    """(U, V) -> direction (reference ``UVtoXYCoord``, ``utility.cpp:389-396``)."""
    pitch = (v * 180.0 - 90.0) * np.pi / 180.0
    yaw = u * 2.0 * np.pi
    return jnp.stack(
        [
            jnp.cos(yaw) * jnp.cos(pitch),
            jnp.sin(pitch),
            jnp.sin(yaw) * jnp.cos(pitch),
        ],
        axis=-1,
    )


def _sample(img, x01, y01, bilinear: bool):
    """Sample (H, W, C) image at normalized coords; x/y in [0,1)."""
    H, W = img.shape[:2]
    if not bilinear:  # reference truncation: uint32(x * width)
        xi = jnp.clip((x01 * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((y01 * H).astype(jnp.int32), 0, H - 1)
        return img[yi, xi]
    fx = jnp.clip(x01 * W - 0.5, 0.0, W - 1.0)
    fy = jnp.clip(y01 * H - 0.5, 0.0, H - 1.0)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    top = img[y0, x0] * (1 - wx) + img[y0, x1] * wx
    bot = img[y1, x0] * (1 - wx) + img[y1, x1] * wx
    return top * (1 - wy) + bot * wy


def mercator_to_cubic(img, bilinear: bool = False):
    """Equirectangular (H, W, C) -> cube atlas of the same shape
    (6 faces packed along X, each W/6 wide — the reference reuses the
    buffer dimensions, ``utility.cpp:351-375``)."""
    img = jnp.asarray(img, jnp.float32)
    H, W = img.shape[:2]
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.0) / H
    xs6 = 6.0 * jnp.arange(W, dtype=jnp.float32) / W  # [0, 6)
    X, Y = jnp.meshgrid(xs6, ys)  # (H, W)
    face = jnp.clip(X.astype(jnp.int32), 0, 5)
    u = X - face
    d = _face_uv_to_dir(face, u, Y)
    mu, mv = _dir_to_mercator_uv(d)
    return _sample(img, mu, mv, bilinear)


def cubic_to_mercator(atlas, bilinear: bool = False):
    """Cube atlas (H, W=6*face_w, C) -> equirectangular of the same shape
    (reference ``utility.cpp:388-471``)."""
    atlas = jnp.asarray(atlas, jnp.float32)
    H, W = atlas.shape[:2]
    vs = (jnp.arange(H, dtype=jnp.float32)) / H
    us = (jnp.arange(W, dtype=jnp.float32)) / W
    U, V = jnp.meshgrid(us, vs)
    d = _mercator_uv_to_dir(U, V)

    from raytracing_tests_tpu.scene.textures import cube_sphere_uv

    face, fu, fv = cube_sphere_uv(d)
    x01 = (face.astype(jnp.float32) + jnp.clip(fu, 0.0, 1.0)) / 6.0
    return _sample(atlas, x01, jnp.clip(fv, 0.0, 1.0), bilinear)


def load_image_texture(path: str, mapping: str = "cubic", bilinear: bool = True):
    """Load a PNG/JPG as a cube atlas for ``SceneBuilder.add_texture``.

    ``mapping='mercator'`` reprojects an equirectangular image (e.g. the
    reference's ``earth.jpg``); ``'cubic'`` takes an already-packed atlas
    (e.g. ``dice.png``, see ``texturing.cpp:41``).
    """
    from raytracing_tests_tpu.utils.io import load_image

    img = load_image(path)[::-1]  # stbi flips vertically on load (utility.cpp:256)
    if mapping == "mercator":
        return np.asarray(mercator_to_cubic(img, bilinear=bilinear))
    assert mapping == "cubic", mapping
    return img
