"""Ray-primitive intersection math, in object-local unit space.

The framework supports the reference's two primitive families
(``In-Next-Week/01_BoundingVolumeHierarchy/computeShaderSrc.glsl:112-210``):

  - ELLIPSOID: the unit sphere scaled per-axis by ``scale`` (a sphere of
    radius r is ``scale = (r, r, r)``).
  - CUBOID: the axis-aligned box ``[-scale/2, +scale/2]``.

All intersection functions take rays already transformed into the object's
local frame and broadcast over leading batch dimensions.  A miss is ``t = -1``
(matching the reference's sentinel) and callers compare ``t > 0``.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_tests_tpu.core import linalg

ELLIPSOID = 1
CUBOID = 2

MISS_T = -1.0


def _safe_inv(d, eps: float = 1e-12):
    """1/d with zero components clamped to +-eps.

    Forward is indistinguishable from the GLSL +-inf convention (slab entries
    land at ~1e12, far beyond any t limit) but gradients stay finite —
    d(1/d)/dd = -1/d^2 at d = 0 would be -inf and poison masked lanes.
    """
    d_safe = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0.0, eps, -eps), d)
    return 1.0 / d_safe


def ray_ellipsoid_t(origin, direction, scale):
    """Nearest positive hit t of a ray with the ellipsoid ``|p/scale| = 1``.

    Semantics mirror the reference's quadratic solve: prefer the near root,
    fall back to the far root when the near root is behind the origin (so rays
    starting inside the ellipsoid hit its back wall).
    """
    o = origin / scale
    d = direction / scale
    half_b = linalg.dot(o, d)
    a = linalg.dot(d, d)
    c = linalg.dot(o, o) - 1.0
    disc = half_b * half_b - a * c
    # Safe-input guards (a == 0 for dead zero-direction lanes; disc <= 0 for
    # misses): masked forward values must still have finite gradients.
    ok = (disc > 0.0) & (a > 1e-30)
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    a_safe = jnp.where(ok, a, 1.0)
    t0 = (-half_b - sq) / a_safe
    t1 = (-half_b + sq) / a_safe
    t = jnp.where((t0 > t1) | (t0 < 0.0), t1, t0)
    t = jnp.where(ok & (t > 0.0), t, MISS_T)
    return t


def ray_cuboid_t(origin, direction, scale):
    """Nearest positive hit t of a ray with the box ``[-scale/2, scale/2]``.

    Slab test; rays starting inside hit the exit face (t = tmax when tmin < 0).
    """
    inv_d = _safe_inv(direction)
    b_min = -scale * 0.5
    b_max = scale * 0.5
    t1 = (b_min - origin) * inv_d
    t2 = (b_max - origin) * inv_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    t = jnp.where(tmax > tmin, jnp.where(tmin > 0.0, tmin, tmax), MISS_T)
    t = jnp.where(t > 0.0, t, MISS_T)
    return t


def ray_primitive_t(origin, direction, scale, obj_type):
    """Dispatch on primitive type (vectorized select, both sides evaluated)."""
    t_e = ray_ellipsoid_t(origin, direction, scale)
    t_c = ray_cuboid_t(origin, direction, scale)
    return jnp.where(obj_type == ELLIPSOID, t_e, jnp.where(obj_type == CUBOID, t_c, MISS_T))


def ellipsoid_normal(hit_point, scale):
    """Outward local normal of the ellipsoid at a local-space hit point."""
    return linalg.normalize(hit_point / (scale * scale))


def cuboid_normal(hit_point, scale):
    """Local normal = axis of the nearest face (ties resolved like the reference:
    faces are scanned in order +x, -x, +y, -y, +z, -z keeping strict minima)."""
    # Distances to the 6 face planes, in reference scan order.
    d_pos = jnp.abs(hit_point - scale * 0.5)  # +x, +y, +z
    d_neg = jnp.abs(hit_point + scale * 0.5)  # -x, -y, -z
    # Interleave to (+x, -x, +y, -y, +z, -z).
    dists = jnp.stack(
        [d_pos[..., 0], d_neg[..., 0], d_pos[..., 1], d_neg[..., 1], d_pos[..., 2], d_neg[..., 2]],
        axis=-1,
    )
    face = jnp.argmin(dists, axis=-1)  # first minimum, matching strict '>' scan
    axis = face // 2
    sign = jnp.where(face % 2 == 0, 1.0, -1.0)
    n = jnp.zeros_like(hit_point)
    eye = jnp.eye(3, dtype=hit_point.dtype)
    n = eye[axis] * sign[..., None]
    return n


def primitive_normal(hit_point, scale, obj_type):
    n_e = ellipsoid_normal(hit_point, scale)
    n_c = cuboid_normal(hit_point, scale)
    return jnp.where((obj_type == ELLIPSOID)[..., None], n_e, n_c)


def ray_aabb_hit(bb_min, bb_max, origin, direction, t_limit):
    """Conservative slab test used by BVH traversal.

    Mirrors ``TestIntersectAABB``
    (``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:187-210``): returns
    True when the slab interval is non-empty and its entry is closer than
    ``t_limit`` (no positivity check on tmax — the reference accepts boxes
    behind the origin; leaf-level intersection then rejects them).
    """
    inv_d = _safe_inv(direction)
    t1 = (bb_min - origin) * inv_d
    t2 = (bb_max - origin) * inv_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (tmax > tmin) & (t_limit > tmin)


def point_in_unit_primitive(local_point, obj_type):
    """Is a local-space point inside the unit primitive (after /scale)?

    Used by the surrounding-refractive-index estimate
    (``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:268-345``).
    ``local_point`` must already be divided by scale.
    """
    in_e = linalg.dot(local_point, local_point) <= 1.0
    in_c = jnp.all(jnp.abs(local_point) <= 0.5, axis=-1)
    return jnp.where(obj_type == ELLIPSOID, in_e, jnp.where(obj_type == CUBOID, in_c, False))


def transform_ray_to_local(origin, direction, position, rotation, delta_position, time_ratio):
    """World ray -> object local frame, with per-sample motion offset.

    The reference offsets the object position by ``(1 - ratio) * delta_pos``
    where ``ratio = sample_index / num_samples``
    (``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:253-257``); we carry
    ``time_ratio`` explicitly per ray.
    """
    shift = (1.0 - time_ratio)[..., None] * delta_position
    o = linalg.apply_rotation_t(rotation, origin - position + shift)
    d = linalg.apply_rotation_t(rotation, direction)
    return o, d


def object_aabb(position, last_position, rotation, scale, obj_type=None):
    """Conservative world AABB of a transformed primitive including motion sweep.

    Mirrors ``Transform_Data::CalculateBBMinMax`` (``In-Next-Week/base.h:24-42``):
    half-extent along world axis k is the norm of row k of ``R @ diag(scale)``,
    swept over the segment [last_position, position].  (The reference uses the
    full `scale` for both primitive types — cuboids get a 2x-loose box; we
    keep that for layout parity of the BVH.)
    """
    rs = rotation * scale[..., None, :]  # R @ diag(scale)
    half = jnp.sqrt(jnp.sum(rs * rs, axis=-1))  # row norms -> (..., 3)
    lo = jnp.minimum(position, last_position) - half
    hi = jnp.maximum(position, last_position) + half
    return lo, hi
