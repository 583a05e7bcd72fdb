"""Cube-sphere texturing: face mapping, atlas layout, procedural textures.

The reference maps hit points on a primitive to one of 6 cube faces via the
dominant axis of the LOCAL (unit-space) hit position, projects onto the face
plane, and looks up a 1x6 horizontal face atlas:
``03_Solid_And_Noise_Textures/computeShaderSrc.glsl:360-409``.

Face order (reference convention): +y=0, +x=1, +z=2, -x=3, -z=4, -y=5, with
the per-face texcoord table reproduced in ``cube_sphere_uv``.

Atlases are ``(H, 6*W, 3)`` float arrays; a stack of them ``(T, H, 6W, 3)``
forms the scene texture array (slot 0 = filler so indices stay 1-based).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.core import linalg


def cube_sphere_uv(local_pos):
    """Local (unit-space) position -> (face, u, v) on the cube-sphere.

    ``local_pos``: (..., 3).  Returns integer face (...,) and uv (...,) pairs
    in [0, 1].  Matches the reference's scan: start with +-x, then let y then z
    win strict-greater comparisons of |component|.
    """
    x, y, z = local_pos[..., 0], local_pos[..., 1], local_pos[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # Reference scan order: face initialized from x, replaced by y if |y|>|x|,
    # replaced by z if |z| > max(|x|,|y|).
    face = jnp.where(x > 0, 1, 3)
    dom = ax
    face = jnp.where(ay > dom, jnp.where(y > 0, 0, 5), face)
    dom = jnp.maximum(dom, ay)
    face = jnp.where(az > dom, jnp.where(z > 0, 2, 4), face)

    face_dirn = jnp.stack(
        [
            jnp.where(face == 1, 1.0, 0.0) - jnp.where(face == 3, 1.0, 0.0),
            jnp.where(face == 0, 1.0, 0.0) - jnp.where(face == 5, 1.0, 0.0),
            jnp.where(face == 2, 1.0, 0.0) - jnp.where(face == 4, 1.0, 0.0),
        ],
        axis=-1,
    )
    # Guarded divide: dead lanes carry local_pos = 0 (denominator 0); their
    # uv is masked downstream but the gradient path must stay finite.
    denom = linalg.dot(local_pos, face_dirn, keepdims=True)
    p = local_pos / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    p = p * 0.5 + 0.5  # (-1,1) -> (0,1)
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]

    # Per-face texcoord table (reference switch, glsl:387-407).
    u = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [px, 1.0 - py, px, pz, 1.0 - py, pz],
    )
    v = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [1.0 - pz, 1.0 - pz, py, py, 1.0 - px, 1.0 - px],
    )
    return face, u, v


def sample_atlas(textures, tex_index, face, u, v):
    """Bilinear sample of the (T, H, 6W, 3) atlas stack.

    ``tex_index`` is 1-based (0 = untextured; callers mask the result).
    Atlas u-coordinate is ``face/6 + u/6`` like the reference.
    """
    T, H, W6, _ = textures.shape
    au = (face.astype(jnp.float32) + jnp.clip(u, 0.0, 1.0)) / 6.0
    av = jnp.clip(v, 0.0, 1.0)

    fx = au * W6 - 0.5
    fy = av * H - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W6 - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W6 - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(fy - y0, 0.0, 1.0)[..., None]

    ti = jnp.clip(tex_index, 0, T - 1)
    c00 = textures[ti, y0, x0]
    c01 = textures[ti, y0, x1]
    c10 = textures[ti, y1, x0]
    c11 = textures[ti, y1, x1]
    return (c00 * (1 - wx) + c01 * wx) * (1 - wy) + (c10 * (1 - wx) + c11 * wx) * wy


# ----------------------------------------------------------------------------
# Procedural atlas generators (host-side, numpy)
# ----------------------------------------------------------------------------


def checker_atlas(size: int = 64, squares: int = 8, c0=(0.1, 0.1, 0.1), c1=(0.9, 0.9, 0.9)):
    """Checkerboard cube atlas (H=size, W=6*size)."""
    yy, xx = np.mgrid[0:size, 0 : 6 * size]
    mask = ((xx * squares // size) + (yy * squares // size)) % 2
    out = np.where(mask[..., None] == 0, np.asarray(c0, np.float32), np.asarray(c1, np.float32))
    return out.astype(np.float32)


def gradient_atlas(size: int = 64):
    """Simple UV-gradient atlas for debugging face orientation."""
    h, w = size, 6 * size
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.stack(
        [xx / (w - 1), yy / (h - 1), np.zeros_like(xx, np.float32)], axis=-1
    ).astype(np.float32)
    return out
