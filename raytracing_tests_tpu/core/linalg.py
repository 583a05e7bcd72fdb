"""Small linear-algebra helpers shared by the renderer.

Conventions (mirrors the reference's object-transform convention, see
``Raytracing-Sandbox/Src/Utilities/utility.cpp:489-516`` and
``In-Next-Week/base.h:56-71`` of the reference repo):

  - An object's rotation matrix ``R`` maps LOCAL -> WORLD directions
    (``n_world = R @ n_local``).  Rays are transformed into local space with
    the transpose: ``o_local = R.T @ (o_world - position)``.
  - Euler angles are applied yaw (Y) first, then pitch (X), then roll (Z):
    ``R = Rz(roll) @ Rx(pitch) @ Ry(yaw)``.

All functions broadcast over leading batch dimensions; vectors are ``(..., 3)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Rotation algebra must stay in true f32: TPU matmuls default to bf16 inputs,
# which is far too coarse for ray transforms.
_HI = jax.lax.Precision.HIGHEST


def rotation_x(radians):
    """Rotation about +X. ``radians`` may be batched."""
    c, s = jnp.cos(radians), jnp.sin(radians)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rotation_y(radians):
    c, s = jnp.cos(radians), jnp.sin(radians)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rotation_z(radians):
    c, s = jnp.cos(radians), jnp.sin(radians)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def rotation_from_euler(rotation_deg):
    """World-from-local rotation from Euler degrees ``(..., 3)`` = (pitch, yaw, roll).

    Order matches the reference (yaw, then pitch, then roll):
    ``R = Rz(roll) @ Rx(pitch) @ Ry(yaw)``.
    """
    r = jnp.deg2rad(rotation_deg)
    rx = rotation_x(r[..., 0])
    ry = rotation_y(r[..., 1])
    rz = rotation_z(r[..., 2])
    zx = jnp.matmul(rz, rx, precision=_HI)
    return jnp.matmul(zx, ry, precision=_HI)


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps: float = 0.0):
    """Normalize with NaN-free gradients: zero vectors map to zero.

    Dead lanes in the wavefront loop carry zero directions; their values are
    masked downstream but their *gradients* are not — ``sqrt``/division at 0
    would poison the whole backward pass (the double-where trick applies).
    """
    n2 = dot(v, v, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, max(eps, 1e-38)))


def safe_normalize(v):
    """Normalize; zero vectors stay zero (used for 'no ray spawned' sentinels)."""
    n2 = dot(v, v, keepdims=True)
    return jnp.where(n2 > 1e-20, v / jnp.sqrt(jnp.maximum(n2, 1e-20)), jnp.zeros_like(v))


def cross(a, b):
    return jnp.cross(a, b)


def reflect(d, n):
    """GLSL reflect: ``d - 2*dot(d,n)*n`` (``n`` need not face the ray)."""
    return d - 2.0 * dot(d, n, keepdims=True) * n


def refract(d, n, eta):
    """GLSL refract semantics: returns 0-vector on total internal reflection.

    ``d`` must be normalized, ``n`` the normal facing against ``d``,
    ``eta = ri_source / ri_target``.
    """
    eta = jnp.asarray(eta)[..., None] if jnp.ndim(eta) == jnp.ndim(d) - 1 else eta
    cos_i = -dot(d, n, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    # Double-where: sqrt'(0) = inf would leak NaN into masked lanes' grads.
    sqrt_k = jnp.where(k > 0.0, jnp.sqrt(jnp.where(k > 0.0, k, 1.0)), 0.0)
    out = eta * d + (eta * cos_i - sqrt_k) * n
    return jnp.where(tir, jnp.zeros_like(out), out)


def schlick(cosine, ref_ratio):
    """Schlick reflectance approximation.

    Mirrors the reference ``Schlick_Approx``
    (``In-One-Weekend/03_Shadows_and_Materials/computeShaderSrc.glsl:185-190``).
    """
    r0 = (1.0 - ref_ratio) / (1.0 + ref_ratio)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def apply_rotation(R, v):
    """``R @ v`` for batched matrices ``(..., 3, 3)`` and vectors ``(..., 3)``."""
    return jnp.einsum("...ij,...j->...i", R, v, precision=_HI)


def apply_rotation_t(R, v):
    """``R.T @ v`` — transform a world vector into the object's local frame."""
    return jnp.einsum("...ji,...j->...i", R, v, precision=_HI)
