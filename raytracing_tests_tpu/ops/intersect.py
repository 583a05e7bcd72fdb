"""Scene intersection: brute-force object sweep (vectorized over lanes x objects).

TPU-first design note: the reference's per-thread BVH stack traversal
(``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:434-475``) does not map
to the VPU's lockstep lanes.  For the scene sizes the reference ships
(2-1000 objects) a dense lane x object sweep keeps every op a fused
elementwise broadcast — no gathers, no divergence — and is the fastest path
on TPU.  ``bvh/traverse.py`` provides the stackless LBVH alternative for
large scenes; both share this module's hit-record contract.

Contract: all functions take flat lane arrays ``o, d: (B, 3)``,
``time_ratio: (B,)`` and return a ``Hit`` SoA of shape (B, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from raytracing_tests_tpu.core import geometry, linalg
from raytracing_tests_tpu.scene.types import Scene

BIG_T = jnp.float32(3.0e38)


@struct.dataclass
class Hit:
    t: jnp.ndarray  # (B,) hit distance; >= t_limit means miss
    obj: jnp.ndarray  # (B,) i32 object index (undefined on miss)
    hit: jnp.ndarray  # (B,) bool
    normal: jnp.ndarray  # (B, 3) world normal at hit (undefined on miss)
    local_pos: jnp.ndarray  # (B, 3) unit-space hit position (for texturing)


def _local_rays(scene: Scene, o, d, time_ratio):
    """Transform lane rays into every object's local frame: (B, N, 3)."""
    shift = (1.0 - time_ratio)[:, None, None] * scene.delta_position[None]
    rel = o[:, None, :] - scene.position[None] + shift  # (B, N, 3)
    lo = jnp.einsum("nji,bnj->bni", scene.rotation, rel, precision=jax.lax.Precision.HIGHEST)
    ld = jnp.einsum("nji,bj->bni", scene.rotation, d, precision=jax.lax.Precision.HIGHEST)
    return lo, ld


def intersect_brute(scene: Scene, o, d, time_ratio, t_limit):
    """Nearest hit across all (valid) objects. (B,N) dense sweep."""
    lo, ld = _local_rays(scene, o, d, time_ratio)
    t = geometry.ray_primitive_t(lo, ld, scene.scale[None], scene.obj_type[None])  # (B, N)
    t = jnp.where(scene.valid[None] & (t > 0.0), t, BIG_T)
    t = jnp.where(t < t_limit[:, None], t, BIG_T)
    obj = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_hit = jnp.take_along_axis(t, obj[:, None], axis=1)[:, 0]
    hit = t_hit < BIG_T
    # Bounded t for misses: every downstream use is masked by ``hit``, but the
    # values still flow through normalize/shading — BIG_T would overflow to
    # inf and produce NaN gradients there.
    t_hit = jnp.where(hit, t_hit, 1.0)

    # Recompute the winning object's local frame once (cheap gather over N).
    rot = scene.rotation[obj]  # (B, 3, 3)
    scale = scene.scale[obj]
    otype = scene.obj_type[obj]
    lo_b = jnp.take_along_axis(lo, obj[:, None, None], axis=1)[:, 0]
    ld_b = jnp.take_along_axis(ld, obj[:, None, None], axis=1)[:, 0]
    p_local = lo_b + t_hit[:, None] * ld_b
    n_local = geometry.primitive_normal(p_local, scale, otype)
    n_world = linalg.apply_rotation(rot, n_local)
    return Hit(t=t_hit, obj=obj, hit=hit, normal=n_world, local_pos=p_local / scale)


def occluded_nearest_obj(scene: Scene, o, d, time_ratio, t_limit):
    """Index of the nearest object hit before ``t_limit`` (-1 if none).

    Used for shadow rays: the reference re-traverses the BVH and then asks
    whether the closest hit is the emissive object
    (``04_Lights_Camera_And_Action/computeShaderSrc.glsl:604-660``).
    """
    lo, ld = _local_rays(scene, o, d, time_ratio)
    t = geometry.ray_primitive_t(lo, ld, scene.scale[None], scene.obj_type[None])
    t = jnp.where(scene.valid[None] & (t > 0.0) & (t < t_limit[:, None]), t, BIG_T)
    obj = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_hit = jnp.take_along_axis(t, obj[:, None], axis=1)[:, 0]
    return jnp.where(t_hit < BIG_T, obj, -1)


def surrounding_refractive_index(scene: Scene, point, time_ratio):
    """Mean refractive index of containing objects with RI != 1.

    Mirrors the reference's point-in-AABB accumulation traversal
    (``01_BVH glsl:268-345, 484-502``) but tests the exact primitives
    directly (the AABB walk is only a culling detail there): accumulate RI
    of every containing OPTICALLY DENSE (ri != 1) object; if the sum
    exceeds 1 return sum/count else 1.  RI-1 containers are air — they
    cannot move the result off 1.0 alone, and skipping them keeps the
    estimate undiluted under geometry overlap while letting the device
    kernels probe a dielectric-only sub-table (sweep2._ri_probe).
    """
    shift = (1.0 - time_ratio)[:, None, None] * scene.delta_position[None]
    rel = point[:, None, :] - scene.position[None] + shift
    local = jnp.einsum("nji,bnj->bni", scene.rotation, rel, precision=jax.lax.Precision.HIGHEST) / scene.scale[None]
    inside = (geometry.point_in_unit_primitive(local, scene.obj_type[None])
              & scene.valid[None] & (scene.refractive_index[None] != 1.0))
    acc = jnp.sum(jnp.where(inside, scene.refractive_index[None], 0.0), axis=1)
    cnt = jnp.sum(inside.astype(jnp.float32), axis=1)
    return jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)
