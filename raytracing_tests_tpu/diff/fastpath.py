"""Fast gradient rendering: Pallas winner-finding + closed-form recompute.

Round 1 fell back to the dense XLA sweep for gradients (2.46 s/frame at
400x225x4spp) because the Pallas kernels have no VJP.  This module removes
the fallback without writing a backward kernel:

  - The WINNER of the nearest-hit sweep is a discrete argmin — its gradient
    is zero almost everywhere — so the Pallas sweep runs under
    ``stop_gradient`` purely to produce the winning object index.
  - Hit distance, normal, and material fields are then RECOMPUTED in closed
    form from the scene parameters of that one object (per-lane gathers +
    the sphere quadratic), and THIS path is differentiated.  Autodiff of the
    recompute is exactly the analytic VJP of the sweep restricted to the
    winner, which is the true gradient of the rendered value wherever the
    winner is locally stable (i.e. away from silhouettes — see
    ``soft_edges`` in ``ops.render`` for the edge-aware estimator).

This is the TPU-native shape of a "backward megakernel": the expensive O(N)
search happens once, forward-only, at kernel speed; the backward touches
O(1) objects per lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.kernels.sweep import HitFields
from raytracing_tests_tpu.kernels.sweep2 import (
    Accel2, make_accel2, sweep2_nearest, sweep2_nearest_edge,
)
from raytracing_tests_tpu.ops.intersect import Hit


@jax.tree_util.register_pytree_node_class
class DiffAccel:
    """Detached accel (sphere-mode ``Accel2`` or generic ``Accel2G``);
    marks the differentiable path."""

    def __init__(self, inner):
        self.inner = inner

    @property
    def mode(self):
        return self.inner.mode

    def tree_flatten(self):
        return (self.inner,), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])


def fastpath_eligible(cfg) -> bool:
    """Single source of truth for when the fast gradient path applies: the
    Pallas intersector, both scene modes, with or without ``soft_edges``
    (round 3: the generic grouped sweep grew its own silhouette-candidate
    output, and the coverage blend below has a rotated-frame form).  Used
    by BOTH ``diff.train.render_loss`` (to set ``diff_mode``) and
    ``ops.render._build_accel`` (to build the ``DiffAccel``) — keep them
    in lockstep through this predicate."""
    return cfg.intersector == "pallas"


def make_diff_accel(scene, has_motion: bool = True,
                    mode: str = "spheres", probe_rows=None) -> DiffAccel:
    detached = jax.tree_util.tree_map(jax.lax.stop_gradient, scene)
    if mode == "spheres":
        return DiffAccel(make_accel2(detached, has_motion=has_motion,
                                     probe_rows=probe_rows))
    from raytracing_tests_tpu.kernels.sweep2g import make_accel2g

    return DiffAccel(make_accel2g(detached, has_motion=has_motion,
                                  probe_rows=probe_rows))


def _winner(accel, o, d, time_ratio, t_limit):
    """Original-scene index of the nearest hit (detached, Pallas-fast)."""
    sg = jax.lax.stop_gradient
    if accel.mode == "spheres":
        _, obj_sorted = sweep2_nearest(
            accel, sg(o), sg(d), sg(time_ratio), sg(t_limit))
    else:
        from raytracing_tests_tpu.kernels.sweep2g import sweep2g_nearest

        _, obj_sorted = sweep2g_nearest(
            accel, sg(o), sg(d), sg(time_ratio), sg(t_limit))
    return jnp.where(obj_sorted >= 0, accel.perm[jnp.maximum(obj_sorted, 0)], -1)


def intersect_diff(accel: DiffAccel, scene, o, d, time_ratio, t_limit,
                   soft: float = 0.0):
    """(Hit, HitFields, alpha) with gradients w.r.t. scene params AND (o, d).

    Both scene modes: the detached winner comes from the sphere-mode MXU
    sweep or the generic grouped sweep (``sweep2g_nearest``) per
    ``accel.mode``; the differentiable recompute below always uses the
    FULL rotation/per-axis-scale/type math, so rotated cuboids and
    anisotropic ellipsoids differentiate exactly like the dense path.

    ``soft > 0`` enables the EDGE-AWARE estimator: lanes that narrowly miss
    every object adopt the kernel's silhouette candidate, and all lanes get
    a smooth coverage ``alpha`` of their candidate.  Sphere mode:
    sigmoid(-(h - r) / (soft * t)) with h the world ray-line distance to
    the center.  Generic mode: the same blend in the object's LOCAL UNIT
    frame (rotate by R^T, divide by scale; ellipsoid silhouette at
    |h_local| = 1, cuboid at Chebyshev distance 0.5 of the closest-approach
    point), rescaled to world units by the geometric-mean scale.  Hard
    visibility becomes a differentiable blend over a ~``soft * t``-wide
    world-space band, so d(image)/d(position, radius, rotation) carries the
    silhouette term that plain autodiff through the discontinuous hit mask
    loses.  ``alpha`` is None when ``soft == 0``.
    """
    sg = jax.lax.stop_gradient
    if soft > 0.0:
        if accel.mode == "spheres":
            _, obj_sorted, edge_sorted = sweep2_nearest_edge(
                accel.inner, sg(o), sg(d), sg(time_ratio), sg(t_limit))
        else:
            from raytracing_tests_tpu.kernels.sweep2g import (
                sweep2g_nearest_edge)

            _, obj_sorted, edge_sorted = sweep2g_nearest_edge(
                accel.inner, sg(o), sg(d), sg(time_ratio), sg(t_limit))
        perm = accel.inner.perm
        obj = jnp.where(obj_sorted >= 0, perm[jnp.maximum(obj_sorted, 0)], -1)
        edge = jnp.where(edge_sorted >= 0, perm[jnp.maximum(edge_sorted, 0)], -1)
        obj = jnp.where(obj >= 0, obj, edge)  # near-miss adopts the candidate
    else:
        obj = _winner(accel.inner, o, d, time_ratio, t_limit)
    hit = obj >= 0
    safe = jnp.maximum(obj, 0)

    # Recompute the winner's hit with EXACTLY intersect_brute's math (same
    # rotation/per-axis-scale frame), so gradients — including anisotropic
    # d/d(scale_x) through a nominally isotropic sphere — match the dense
    # path bit-for-bit.
    from raytracing_tests_tpu.core import geometry, linalg

    rot = scene.rotation[safe]
    scale = scene.scale[safe]
    otype = scene.obj_type[safe]
    rel = (o - scene.position[safe]
           + (1.0 - time_ratio)[:, None] * scene.delta_position[safe])
    lo = linalg.apply_rotation_t(rot, rel)
    ld = linalg.apply_rotation_t(rot, d)
    t = geometry.ray_primitive_t(lo, ld, scale, otype)

    alpha = None
    if soft > 0.0:
        if accel.mode == "spheres":
            # Isotropic coverage: h = distance from center to the ray line,
            # evaluated at the closest-approach point t_cl (> 0 by the
            # kernel's forward filter). Smooth both sides of the silhouette.
            a = jnp.maximum(jnp.sum(d * d, axis=1), 1e-20)
            half_b = jnp.sum(rel * d, axis=1)
            t_cl = -half_b / a
            h2 = jnp.sum(rel * rel, axis=1) - half_b * half_b / a
            h = jnp.sqrt(jnp.maximum(h2, 1e-20))
            r_iso = scale[:, 0]
            band = soft * jnp.maximum(jnp.abs(t_cl), 1e-3)
            alpha = jax.nn.sigmoid(-(h - r_iso) / band)
        else:
            # Rotated-frame coverage: the closest-approach point of the
            # ray to the object in its LOCAL UNIT space (lo/scale, ld/scale
            # — the fastpath transform above, divided by scale so the
            # ellipsoid is the unit sphere and the cuboid the unit cube).
            # The silhouette distance is |q| - 1 (ellipsoid) or the
            # Chebyshev max|q| - 0.5 (cuboid); both rescale to world units
            # by the geometric-mean scale so the band stays ~soft * t wide.
            ssafe = jnp.maximum(scale, 1e-20)
            lo_s = lo / ssafe
            ld_s = ld / ssafe
            a = jnp.maximum(jnp.sum(ld_s * ld_s, axis=1), 1e-20)
            half_b = jnp.sum(lo_s * ld_s, axis=1)
            t_cl = -half_b / a  # world ray parameter (same t either frame)
            q = lo_s + t_cl[:, None] * ld_s
            h_ell = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=1), 1e-20))
            h_cub = jnp.max(jnp.abs(q), axis=1)
            from raytracing_tests_tpu.core import geometry as _geom

            is_ell = otype == _geom.ELLIPSOID
            # Distance past the silhouette, in local units -> world units.
            over = jnp.where(is_ell, h_ell - 1.0, 2.0 * (h_cub - 0.5))
            r_geo = jnp.exp(jnp.mean(jnp.log(ssafe), axis=1))
            band = soft * jnp.maximum(jnp.abs(t_cl), 1e-3)
            alpha = jax.nn.sigmoid(-(over * r_geo) / band)
        alpha = jnp.where(hit, alpha, 0.0)
        # Geometric-miss lanes (adopted candidates) hit at the tangent point.
        real = t < 2.9e38
        t = jnp.where(real, t, t_cl)

    t = jnp.where(hit, t, 1.0)
    p_local = lo + t[:, None] * ld
    n_local = geometry.primitive_normal(p_local, scale, otype)
    normal = linalg.apply_rotation(rot, n_local)
    local_pos = p_local / scale

    flds = HitFields(
        color=scene.color[safe],
        refractive_index=scene.refractive_index[safe],
        refractivity=scene.refractivity[safe],
        reflectivity=scene.reflectivity[safe],
        scatter_refract=scene.scatter_refract[safe],
        scatter_reflect=scene.scatter_reflect[safe],
        texture_index=scene.texture_index[safe],
        emissive=scene.emissive[safe] & hit,
    )
    h = Hit(t=t, obj=obj, hit=hit, normal=normal, local_pos=local_pos)
    return h, flds, alpha


def occluded_nearest_obj_diff(accel: DiffAccel, scene, o, d, time_ratio, t_limit):
    """Shadow-ray occlusion is discrete: detached winner index."""
    return _winner(accel.inner, o, d, time_ratio, t_limit)
