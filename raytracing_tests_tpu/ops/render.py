"""The wavefront path tracer: a jit-compatible bounded ray-queue bounce loop.

This is the TPU-native re-design of the reference's flagship GLSL megakernel
(``In-Next-Week/01_BoundingVolumeHierarchy/computeShaderSrc.glsl`` and its
texturing/lights descendants).  The GPU kernel's per-thread float stack of
(ray, contribution, bounce) records becomes a fixed-capacity per-lane ray
QUEUE held in registers/VMEM as SoA arrays, processed LIFO by a
``lax.scan`` of static trip count — no divergence, fully vectorized across
the (pixel x sample) lane axis.

Semantics reproduced (see file:line cites in the helpers):
  - absorption shading: every processed ray adds ``contribution * albedo``;
    each hit spawns up to two children (refract, reflect) and damps its own
    contribution by ``1 - 0.5 * (spawned fractions)``,
  - surrounding-refractive-index estimation by point-inclusion,
  - deterministic sunflower/cone sample distributions (no RNG),
  - per-sample motion-blur time, emissive "paint it white" lights with
    AABB-targeted shadow rays, cube-sphere texturing,
  - per-sample gamma-2 then mean over samples.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from raytracing_tests_tpu.core import linalg, sampling
from raytracing_tests_tpu.ops import intersect as isect
from raytracing_tests_tpu.ops.camera_rays import primary_rays
from raytracing_tests_tpu.scene import textures as tex
from raytracing_tests_tpu.scene.types import Camera, Scene

MAX_T_DEPTH = 32000.0  # reference 01_BVH glsl:364


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time) render parameters.

    Replaces the reference's configuration-by-shader-source-rewriting
    (``In-Next-Week/base.h:333-446``): here a config change is just a new jit
    trace.
    """

    width: int = 128
    height: int = 72
    spp: int = 4  # samples per pixel (the reference's workgroup local size)
    max_bounces: int = 5  # RT_Base default (base.h:310)
    queue_capacity: int = 5  # 40-float stack / 8 floats per record (glsl:80)
    max_pops: Optional[int] = None  # ray-tree budget; None -> 2*max_bounces + 1
    t_max: float = MAX_T_DEPTH
    gamma: float = 2.0
    background: tuple = ((1.0, 1.0, 1.0), (0.3, 0.4, 1.0))  # bottom, top
    enable_lights: bool = True
    intersector: str = "brute"  # 'brute' | 'bvh' | 'pallas'
    # 'bvh': the In-Next-Week family shading (surrounding-RI estimation,
    #        deviate-cone scatter, 0.5-forward damping — 01_BVH glsl:553-592).
    # 'materials': the IOW-03 Shirley-materials model (per-ray medium RI,
    #        Schlick contribution shift, fibonacci-hemisphere scatter —
    #        03_Shadows_and_Materials glsl:291-353).
    shading: str = "bvh"
    show_normals: bool = False  # debug view (Sphere.cpp:54, groups.cpp:66)
    lane_chunk: Optional[int] = None  # bound peak memory: lanes per lax.map step
    aa_grid: bool = False  # sub-pixel supersampling grid (IOW-02 AA)
    # early_exit uses lax.while_loop to stop as soon as every ray queue
    # drains (big forward-pass win) but while_loop is not reverse-mode
    # differentiable -- diff/ flips this off automatically.
    early_exit: bool = True
    # Static scene features (trace-time specialization; set via for_scene()).
    # has_dielectrics gates the O(N) surrounding-refractive-index sweep -- the
    # single most expensive per-pop op for scenes that never refract.
    has_dielectrics: bool = True
    pallas_mode: str = "generic"  # 'spheres' | 'generic' (set via for_scene)
    pallas_groups: int = 32  # group size for block-level culling (0 = off)
    pallas_v2: bool = True  # rays-on-lanes MXU kernel (kernels/sweep2.py)
    # Gradient rendering: winner-finding via the (detached) Pallas sweep +
    # differentiable closed-form recompute (diff/fastpath.py). Set by
    # diff.render_loss; requires sphere mode.
    diff_mode: bool = False
    # Edge-aware gradients (diff_mode only): >0 turns hard visibility into a
    # smooth coverage blend over a band of ``soft_edges * t`` world units
    # (~2e-3 is one pixel at 450p). Training-only: biases the image by
    # ~half-pixel silhouette blur, unbiases d(image)/d(geometry).
    soft_edges: float = 0.0
    has_motion: bool = True  # static no-motion kernel specialization
    # Static count of dielectric (ri != 1) rows — sizes the trailing
    # surrounding-RI probe sub-table (sweep2.make_accel2).  -1 = count at
    # accel-build time (concrete scenes only; traced builds require it).
    probe_rows: int = -1

    def for_scene(self, scene) -> "RenderConfig":
        """Specialize static flags from a CONCRETE (non-traced) scene."""
        from raytracing_tests_tpu.kernels.sweep import scene_has_motion, scene_mode

        refr = np.asarray(scene.refractivity) * np.asarray(scene.valid)
        dmask = np.asarray(scene.valid) & (
            np.asarray(scene.refractive_index) != 1.0)
        has_d = bool((refr > 0.002).any())
        # The probe sub-table is consumed only on the has_dielectrics
        # bvh-shading path (needs_sur_ri below) — don't spend the VMEM rows
        # otherwise (a 1k-object scene of inert ri=1.5 objects would carry
        # a full scene-sized probe copy it never reads).
        use_probe = has_d and self.shading != "materials"
        return dataclasses.replace(
            self,
            has_dielectrics=has_d,
            pallas_mode=scene_mode(scene),
            has_motion=scene_has_motion(scene),
            probe_rows=int(dmask.sum()) if use_probe else 0,
        )

    @property
    def pops(self) -> int:
        return self.max_pops if self.max_pops is not None else 2 * self.max_bounces + 1


@struct.dataclass
class Lights:
    """Static-shape emissive-object list (the reference's std430 lights SSBO,
    ``lights.cpp:24-35``)."""

    bb_min: jnp.ndarray  # (L, 3)
    bb_max: jnp.ndarray  # (L, 3)
    geom_idx: jnp.ndarray  # (L,) i32
    mask: jnp.ndarray  # (L,) bool

    @property
    def capacity(self) -> int:
        return self.geom_idx.shape[0]

    @property
    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))


def extract_lights(scene: Scene, capacity: Optional[int] = None) -> Optional[Lights]:
    """Host-side: collect emissive objects' AABBs into a padded Lights SoA.

    Requires a concrete (non-traced) scene.  Returns None when the scene has
    no emissives, which statically disables the shadow-ray pass.
    """
    emissive = np.asarray(scene.emissive) & np.asarray(scene.valid)
    idx = np.nonzero(emissive)[0]
    if idx.size == 0:
        return None
    cap = capacity or int(idx.size)
    cap = max(cap, int(idx.size))
    lo, hi = scene.world_aabbs()
    lo, hi = np.asarray(lo), np.asarray(hi)
    bb_min = np.zeros((cap, 3), np.float32)
    bb_max = np.zeros((cap, 3), np.float32)
    geom = np.zeros((cap,), np.int32)
    mask = np.zeros((cap,), bool)
    bb_min[: idx.size] = lo[idx]
    bb_max[: idx.size] = hi[idx]
    geom[: idx.size] = idx
    mask[: idx.size] = True
    return Lights(
        bb_min=jnp.asarray(bb_min),
        bb_max=jnp.asarray(bb_max),
        geom_idx=jnp.asarray(geom),
        mask=jnp.asarray(mask),
    )


# ----------------------------------------------------------------------------
# Per-lane ray queue (SoA). LIFO, silently drops pushes when full — matching
# the reference stack macros (01_BVH glsl:84-108).
# ----------------------------------------------------------------------------


@struct.dataclass
class RayQueue:
    origin: jnp.ndarray  # (B, Q, 3)
    direction: jnp.ndarray  # (B, Q, 3)
    contribution: jnp.ndarray  # (B, Q)
    bounced: jnp.ndarray  # (B, Q) i32
    # Medium tracking for the IOW-03 materials model: the refractive index of
    # the medium each queued ray travels IN, plus the medium of its parent —
    # a depth-2 medium stack, the clean version of the reference's
    # ``skippast_ParentsForRI`` stack-peek (03_Shadows glsl:262-264, 291-345).
    medium: jnp.ndarray  # (B, Q)
    parent_medium: jnp.ndarray  # (B, Q)
    size: jnp.ndarray  # (B,) i32

    @classmethod
    def create(cls, batch: int, capacity: int):
        return cls(
            origin=jnp.zeros((batch, capacity, 3), jnp.float32),
            direction=jnp.zeros((batch, capacity, 3), jnp.float32),
            contribution=jnp.zeros((batch, capacity), jnp.float32),
            bounced=jnp.zeros((batch, capacity), jnp.int32),
            medium=jnp.ones((batch, capacity), jnp.float32),
            parent_medium=jnp.ones((batch, capacity), jnp.float32),
            size=jnp.zeros((batch,), jnp.int32),
        )

    def push(self, mask, origin, direction, contribution, bounced,
             medium=None, parent_medium=None):
        """Vectorized conditional push at position ``size`` for lanes in
        ``mask``.  Returns ``(queue, n_dropped)`` — pushes beyond capacity are
        silently dropped exactly like the reference stack macros, but the
        count is surfaced so renderers can report honest ray accounting."""
        q = self.origin.shape[1]
        can = mask & (self.size < q)
        slot = jax.nn.one_hot(self.size, q, dtype=bool) & can[:, None]  # (B, Q)
        n_dropped = jnp.sum((mask & ~can).astype(jnp.int32))
        if medium is None:
            medium = jnp.ones(mask.shape[0], jnp.float32)
        if parent_medium is None:
            parent_medium = jnp.ones(mask.shape[0], jnp.float32)
        return RayQueue(
            origin=jnp.where(slot[..., None], origin[:, None, :], self.origin),
            direction=jnp.where(slot[..., None], direction[:, None, :], self.direction),
            contribution=jnp.where(slot, contribution[:, None], self.contribution),
            bounced=jnp.where(slot, bounced[:, None], self.bounced),
            medium=jnp.where(slot, medium[:, None], self.medium),
            parent_medium=jnp.where(slot, parent_medium[:, None], self.parent_medium),
            size=self.size + can.astype(jnp.int32),
        ), n_dropped

    def pop(self):
        """LIFO pop; lanes with empty queues return zeros and active=False."""
        active = self.size > 0
        idx = jnp.maximum(self.size - 1, 0)
        # Exact one-hot SELECT, not an einsum: on TPU an f32 einsum runs on
        # the MXU in bf16 passes by default, and bf16-rounding the popped
        # origins wipes out the 1e-4 surface offsets on child rays ->
        # silent self-reintersection (2.6x ray blowup on the motion scene,
        # chip-only; CPU einsum is exact f32 and hid it).
        sel = jax.nn.one_hot(idx, self.origin.shape[1], dtype=bool)  # (B, Q)
        pick3 = lambda a: jnp.sum(jnp.where(sel[..., None], a, 0.0), axis=1)
        pick1 = lambda a: jnp.sum(jnp.where(sel, a, 0), axis=1)
        o = pick3(self.origin)
        d = pick3(self.direction)
        c = pick1(self.contribution)
        b = pick1(self.bounced)
        med = pick1(self.medium)
        pmed = pick1(self.parent_medium)
        new = dataclasses.replace(self, size=self.size - active.astype(jnp.int32))
        return new, active, o, d, c, b, med, pmed


# ----------------------------------------------------------------------------
# Shading
# ----------------------------------------------------------------------------


def _background(cfg: RenderConfig, direction, has_lights: bool):
    """Sky gradient; black when the scene has lights (lights glsl:23-30)."""
    if has_lights:
        return jnp.zeros(direction.shape[:-1] + (3,), jnp.float32)
    bottom = jnp.asarray(cfg.background[0], jnp.float32)
    top = jnp.asarray(cfg.background[1], jnp.float32)
    t = (direction[..., 1:2] + 1.0) * 0.5
    return (1.0 - t) * bottom + t * top


def _material_color(scene: Scene, hit: isect.Hit, color, ti):
    """Albedo, cube-sphere-textured when the object has a texture index
    (03_Texturing glsl:353-414)."""
    if scene.textures is None:
        return color
    face, u, v = tex.cube_sphere_uv(hit.local_pos)
    tc = tex.sample_atlas(scene.textures, ti, face, u, v)
    return jnp.where((ti > 0)[:, None], color * tc, color)


def _shadow_factor(scene, lights: Lights, hit, normal, sample_ratio, time_ratio, accel=None):
    """Fraction of lights visible from the hit point (lights glsl:604-660).

    Each lane aims at a per-sample point inside each light's AABB; a light
    counts as visible when the nearest occluder IS the light object.

    The light axis is BATCHED into one flattened (L*B)-lane occlusion sweep
    instead of a per-light scan — one kernel launch regardless of light
    count, and masked lights carry zero directions so the sweep's live-mask
    culling makes their lanes nearly free."""
    origin = hit + 1e-4 * normal
    B = origin.shape[0]
    Lc = lights.capacity
    bb_min, bb_max = lights.bb_min, lights.bb_max  # (Lc, 3)
    center = (bb_min + bb_max) * 0.5
    target = bb_min[:, None, :] + (bb_max - bb_min)[:, None, :] * sample_ratio[None, :, None]
    t_lim = (
        jnp.sqrt(jnp.sum((center[:, None, :] - origin[None]) ** 2, axis=-1))
        + jnp.sqrt(jnp.sum((bb_max - bb_min) ** 2, axis=-1))[:, None]
    )  # (Lc, B)
    d = linalg.normalize(target - origin[None]) * lights.mask[:, None, None]
    o_f = jnp.broadcast_to(origin[None], (Lc, B, 3)).reshape(-1, 3)
    tr_f = jnp.broadcast_to(time_ratio[None], (Lc, B)).reshape(-1)
    nearest = _nearest_obj(
        scene, accel, o_f, d.reshape(-1, 3), tr_f, t_lim.reshape(-1))
    lit = (scene.emissive[jnp.maximum(nearest, 0)] & (nearest >= 0)).reshape(Lc, B)
    is_lit = jnp.sum(
        jnp.where(lights.mask[:, None], lit.astype(jnp.float32), 0.0), axis=0)
    return is_lit / jnp.maximum(lights.count.astype(jnp.float32), 1.0)


def _is_pallas(accel) -> bool:
    from raytracing_tests_tpu.kernels.sweep import PallasAccel

    return isinstance(accel, PallasAccel)


def _is_v2(accel) -> bool:
    from raytracing_tests_tpu.kernels.sweep2 import Accel2

    return isinstance(accel, Accel2)


def _is_diff(accel) -> bool:
    from raytracing_tests_tpu.diff.fastpath import DiffAccel

    return isinstance(accel, DiffAccel)


def _surrounding_ri(scene, accel, point, time_ratio):
    if accel is None or _is_diff(accel):
        # Diff path: the dense containment sum is differentiable w.r.t. the
        # member objects' refractive_index (and smoothly w.r.t. geometry away
        # from containment boundaries).
        return isect.surrounding_refractive_index(scene, point, time_ratio)
    if _is_pallas(accel):
        from raytracing_tests_tpu.kernels.sweep import surrounding_ri_pallas

        return surrounding_ri_pallas(accel, scene, point, time_ratio)
    from raytracing_tests_tpu.bvh.traverse import traverse_point_ri

    return traverse_point_ri(accel, scene, point, time_ratio)


def _nearest(scene, accel, o, d, time_ratio, t_limit):
    """Intersector dispatch: dense sweep, Pallas sweep kernel, or LBVH
    traversal (same Hit contract)."""
    if accel is None:
        return isect.intersect_brute(scene, o, d, time_ratio, t_limit)
    if _is_diff(accel):
        from raytracing_tests_tpu.diff.fastpath import intersect_diff

        return intersect_diff(accel, scene, o, d, time_ratio, t_limit)[0]  # hard
    if _is_v2(accel):
        from raytracing_tests_tpu.kernels.sweep2 import intersect2

        return intersect2(accel, scene, o, d, time_ratio, t_limit)
    if _is_pallas(accel):
        from raytracing_tests_tpu.kernels.sweep import intersect_pallas

        return intersect_pallas(accel, scene, o, d, time_ratio, t_limit)
    from raytracing_tests_tpu.bvh.traverse import traverse_nearest

    return traverse_nearest(accel, scene, o, d, time_ratio, t_limit)


def _nearest_obj(scene, accel, o, d, time_ratio, t_limit):
    if accel is None:
        return isect.occluded_nearest_obj(scene, o, d, time_ratio, t_limit)
    if _is_diff(accel):
        from raytracing_tests_tpu.diff.fastpath import occluded_nearest_obj_diff

        return occluded_nearest_obj_diff(accel, scene, o, d, time_ratio, t_limit)
    if _is_v2(accel):
        from raytracing_tests_tpu.kernels.sweep2 import occluded_nearest_obj2

        return occluded_nearest_obj2(accel, scene, o, d, time_ratio, t_limit)
    if _is_pallas(accel):
        from raytracing_tests_tpu.kernels.sweep import occluded_nearest_obj_pallas

        return occluded_nearest_obj_pallas(accel, scene, o, d, time_ratio, t_limit)
    from raytracing_tests_tpu.bvh.traverse import traverse_nearest_obj

    return traverse_nearest_obj(accel, scene, o, d, time_ratio, t_limit)


@struct.dataclass
class ShadeResult:
    """Everything one shading step produces for a batch of rays: color to
    accumulate, spawned child rays, and bookkeeping.  Shared by the per-lane
    queue renderer (below) and the compacting work-queue renderer
    (``ops.workqueue``)."""

    add_color: jnp.ndarray  # (C, 3) contribution to accumulate
    set_white: jnp.ndarray  # (C,) emissive abort: sample becomes pure white
    hit_t: jnp.ndarray  # (C,) hit distance (t_max convention on miss)
    did_hit: jnp.ndarray  # (C,) bool (post-emissive-abort)
    missed: jnp.ndarray  # (C,) bool
    # children, refraction first (reference push order, LIFO pops reflect 1st)
    refr_mask: jnp.ndarray
    refr_o: jnp.ndarray
    refr_d: jnp.ndarray
    refr_contrib: jnp.ndarray
    refl_mask: jnp.ndarray
    refl_o: jnp.ndarray
    refl_d: jnp.ndarray
    refl_contrib: jnp.ndarray
    bounced: jnp.ndarray  # (C,) child bounce count
    # Medium tracking (materials shading; constant 1.0 under 'bvh').
    refr_medium: jnp.ndarray
    refr_parent: jnp.ndarray
    refl_medium: jnp.ndarray
    refl_parent: jnp.ndarray


def shade_rays(scene, lights, cfg: RenderConfig, accel, o, d, contrib, bounced, active, sample_idx, time_ratio, medium=None, parent_medium=None):
    """Intersect + shade one batch of rays (the GLSL kernel body,
    01_BVH glsl:415-594 or 03_Shadows glsl:291-353, minus stack plumbing)."""
    spp = cfg.spp
    if medium is None:
        medium = jnp.ones(o.shape[0], jnp.float32)
    if parent_medium is None:
        parent_medium = jnp.ones(o.shape[0], jnp.float32)
    t_limit = jnp.full(o.shape[0], cfg.t_max, jnp.float32)
    sur_ri_fused = None
    soft_alpha = None
    needs_sur_ri = cfg.has_dielectrics and cfg.shading != "materials"
    if _is_diff(accel):
        from raytracing_tests_tpu.diff.fastpath import intersect_diff

        hit, flds, soft_alpha = intersect_diff(
            accel, scene, o, d, time_ratio, t_limit, soft=cfg.soft_edges
        )
    elif _is_v2(accel):
        from raytracing_tests_tpu.kernels.sweep2 import (
            intersect2_full, intersect2_fused,
        )

        if needs_sur_ri:
            hit, flds, sur_ri_fused = intersect2_fused(
                accel, scene, o, d, time_ratio, t_limit
            )
        else:
            hit, flds = intersect2_full(accel, scene, o, d, time_ratio, t_limit)
    elif _is_pallas(accel):
        if needs_sur_ri:
            from raytracing_tests_tpu.kernels.sweep import intersect_pallas_fused

            hit, flds, sur_ri_fused = intersect_pallas_fused(
                accel, scene, o, d, time_ratio, t_limit
            )
        else:
            from raytracing_tests_tpu.kernels.sweep import intersect_pallas_full

            hit, flds = intersect_pallas_full(accel, scene, o, d, time_ratio, t_limit)
    else:
        hit = _nearest(scene, accel, o, d, time_ratio, t_limit)
        flds = None
    did_hit = hit.hit & active
    missed = active & ~hit.hit

    # Miss -> background contribution.
    bg = _background(cfg, d, lights is not None)
    add_color = jnp.where(missed[:, None], contrib[:, None] * bg, 0.0)
    if soft_alpha is not None:
        # Edge-aware blend: the lane covers its candidate with weight alpha
        # and leaks (1 - alpha) of the background through; the whole hit
        # subtree (local term + children) scales by alpha via ``contrib``.
        add_color = add_color + jnp.where(
            did_hit[:, None], (contrib * (1.0 - soft_alpha))[:, None] * bg, 0.0
        )
        contrib = jnp.where(did_hit, contrib * soft_alpha, contrib)

    # --- hit shading ---------------------------------------------------------
    hit_point = o + hit.t[:, None] * d
    normal = hit.normal
    inner = linalg.dot(normal, d) > 0.0

    if sur_ri_fused is not None:
        sur_ri = sur_ri_fused
    elif needs_sur_ri:
        sur_ri = _surrounding_ri(scene, accel, hit_point + 1e-3 * normal, time_ratio)
    else:
        sur_ri = jnp.ones(hit_point.shape[0], jnp.float32)

    if flds is None:
        base_color, tex_idx = scene.color[hit.obj], scene.texture_index[hit.obj]
        mat_ri = scene.refractive_index[hit.obj]
        refractivity = scene.refractivity[hit.obj]
        reflectivity = scene.reflectivity[hit.obj]
        scat_rfr = scene.scatter_refract[hit.obj]
        scat_rfl = scene.scatter_reflect[hit.obj]
        emissive = scene.emissive[hit.obj]
    else:  # pallas: all fields from one MXU gather
        base_color, tex_idx = flds.color, flds.texture_index
        mat_ri = flds.refractive_index
        refractivity = flds.refractivity
        reflectivity = flds.reflectivity
        scat_rfr = flds.scatter_refract
        scat_rfl = flds.scatter_reflect
        emissive = flds.emissive
    mat_color = _material_color(scene, hit, base_color, tex_idx)

    # Emissive abort: sample becomes pure white (lights glsl:662-666).
    set_white = jnp.zeros(o.shape[0], bool)
    if lights is not None:
        set_white = did_hit & emissive
        did_hit = did_hit & ~set_white

        lit = _shadow_factor(
            scene, lights, hit_point, normal, sample_idx / spp, time_ratio, accel
        )
        contrib = jnp.where(did_hit, contrib * lit, contrib)

    bounced = bounced + 1

    if cfg.shading == "materials":
        return _shade_materials(
            cfg, o, d, contrib, bounced, did_hit, missed, set_white, hit,
            hit_point, normal, mat_color, mat_ri, refractivity, reflectivity,
            scat_rfr, scat_rfl, medium, parent_medium, sample_idx, spp,
            add_color,
        )

    can_spawn = (
        ((reflectivity > 0.002) | (refractivity > 0.002))
        & (contrib > 0.01)
        & (bounced < cfg.max_bounces)
        & did_hit
    )

    # Outer hit: scatter-deviated reflect/refract (01_BVH glsl:556-577).
    refl_outer = linalg.normalize(linalg.reflect(d, normal), eps=1e-20)
    refl_outer = jnp.where(
        (scat_rfl > 0.001)[:, None],
        sampling.deviate_within_cone(refl_outer, sample_idx, spp, scat_rfl),
        refl_outer,
    )
    refr_outer = linalg.safe_normalize(linalg.refract(d, normal, sur_ri / mat_ri))
    # Double-where: TIR lanes carry a zero refr_outer; deviate_within_cone's
    # internals are NaN *in gradient* at the zero vector, and 0 * NaN = NaN
    # would leak through the outer select's backward.
    refr_live = (linalg.dot(refr_outer, refr_outer) > 0.1)[:, None]
    refr_safe = jnp.where(refr_live, refr_outer, jnp.asarray([0.0, 0.0, 1.0]))
    refr_outer = jnp.where(
        (scat_rfr > 0.001)[:, None] & refr_live,
        sampling.deviate_within_cone(refr_safe, sample_idx, spp, scat_rfr),
        refr_outer,
    )
    refl_outer = jnp.where((reflectivity > 0.002)[:, None], refl_outer, 0.0)
    refr_outer = jnp.where((refractivity > 0.002)[:, None], refr_outer, 0.0)

    # Inner hit: flip normal, 100% refract, reflect on TIR (glsl:578-585).
    n_in = -normal
    refr_inner = linalg.refract(d, n_in, mat_ri / sur_ri)
    tir = linalg.dot(refr_inner, refr_inner) < 0.1
    refl_inner = jnp.where(tir[:, None], linalg.reflect(d, n_in), 0.0)

    normal_out = jnp.where(inner[:, None], n_in, normal)
    refl_dir = jnp.where(inner[:, None], refl_inner, refl_outer)
    refr_dir = jnp.where(inner[:, None], refr_inner, refr_outer)

    spawn_refr = can_spawn & (linalg.dot(refr_dir, refr_dir) > 0.1)
    spawn_refl = can_spawn & (linalg.dot(refl_dir, refl_dir) > 0.1)

    # Children inherit the UNDAMPED contribution (reference pushes before
    # damping, 01_BVH glsl:553-592); the parent's own absorption term is then
    # damped by half of what was forwarded.
    refr_contrib = contrib * refractivity
    refl_contrib = contrib * reflectivity
    forward = (
        jnp.where(spawn_refr, refractivity, 0.0) + jnp.where(spawn_refl, reflectivity, 0.0)
    )
    contrib = contrib * (1.0 - 0.5 * forward)
    add_color = add_color + jnp.where(did_hit[:, None], contrib[:, None] * mat_color, 0.0)

    return ShadeResult(
        add_color=add_color,
        set_white=set_white,
        hit_t=jnp.where(hit.hit, hit.t, cfg.t_max),
        did_hit=did_hit,
        missed=missed,
        refr_mask=spawn_refr,
        refr_o=hit_point - 1e-4 * normal_out,
        refr_d=refr_dir,
        refr_contrib=refr_contrib,
        refl_mask=spawn_refl,
        refl_o=hit_point + 1e-4 * normal_out,
        refl_d=refl_dir,
        refl_contrib=refl_contrib,
        bounced=bounced,
        refr_medium=jnp.ones_like(contrib),
        refr_parent=jnp.ones_like(contrib),
        refl_medium=jnp.ones_like(contrib),
        refl_parent=jnp.ones_like(contrib),
    )


def _shade_materials(cfg, o, d, contrib, bounced, did_hit, missed, set_white,
                     hit, hit_point, normal, mat_color, mat_ri, refractivity,
                     reflectivity, scat_rfr, scat_rfl, medium, parent_medium,
                     sample_idx, spp, add_color):
    """The IOW-03 Shirley-materials spawn model
    (``03_Shadows_and_Materials/computeShaderSrc.glsl:291-353``):

      - per-ray MEDIUM refractive index: an inner hit refracts toward the
        popped ray's parent medium (the reference peeks its sibling stack
        entry via ``skippast_ParentsForRI``; carrying (medium, parent_medium)
        per ray is the clean depth-2 equivalent — grandparent media beyond
        depth 2 approximate to air, which is also where the reference's hack
        degrades),
      - Schlick reflectance shifts contribution from refraction to
        reflection on outer hits (glsl:326-333),
      - an outer hit ALWAYS spawns a reflection, scattered on the fibonacci
        hemisphere (glsl:325-327); refraction scatters likewise (glsl:345),
      - TIR converts the refraction into a contribution-1.0 reflection
        (glsl:334-335; the reference pushes an uninitialized
        ``reflection_dirn`` there — GLSL UB — we use the mirror direction it
        plainly intended),
      - the local absorption term is ``contribution^2 * albedo``: LaunchRay
        pre-multiplies ``data.color`` by the contribution and LaunchRays
        multiplies again (glsl:250, 304) — reproduced faithfully,
      - no 0.5-forward damping and no contribution cutoff (zero-contribution
        children are skipped here: they add exactly nothing).
    """
    cos_theta = linalg.dot(normal, d)  # > 0 <=> inner hit (glsl:315)
    inner_m = cos_theta > 0.0
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    target = jnp.where(inner_m, parent_medium, mat_ri)
    ratio = medium / jnp.maximum(target, 1e-6)
    ratio_sin = ratio * sin_theta
    tir = ratio_sin > 1.0

    refr_c = refractivity
    refl_c = reflectivity
    # Outer: Schlick shift from refraction to reflection (glsl:326-333).
    shift = jnp.where(
        ~inner_m, refr_c * linalg.schlick(jnp.clip(-cos_theta, 0.0, 1.0), ratio), 0.0
    )
    refr_c = refr_c - shift
    refl_c = refl_c + shift
    # TIR: the refraction becomes a full-strength reflection (glsl:334-335).
    refl_c = jnp.where(tir, 1.0, jnp.where(inner_m, 0.0, refl_c))

    # Reference LaunchRay's grazing-reflection lift (glsl:230-247): the
    # mirror direction is raised to a minimum elevation set by the scatter.
    _normal = jnp.where(inner_m[:, None], -normal, normal)  # toward incident
    refl_mirror = linalg.reflect(d, normal)
    n2ir = linalg.normalize(linalg.cross(_normal, d), eps=1e-20)
    n2n = linalg.normalize(linalg.cross(n2ir, _normal), eps=1e-20)
    s = jnp.where(inner_m, scat_rfr, scat_rfl)
    inv = 1.0 / jnp.sqrt(1.0 + s * s)
    max_reflect = (s * inv)[:, None] * _normal + inv[:, None] * n2n
    lift = linalg.dot(refl_mirror, _normal) <= linalg.dot(max_reflect, _normal)
    refl_base = jnp.where((lift & ~inner_m)[:, None], max_reflect, refl_mirror)

    refl_dir = sampling.fibonacci_hemisphere(sample_idx, spp, scat_rfl, refl_base)
    refl_dir = jnp.where((tir & inner_m)[:, None], refl_base, refl_dir)
    spawn_refl = did_hit & (bounced < cfg.max_bounces) & (~inner_m | tir)
    spawn_refl = spawn_refl & (contrib * refl_c > 0.0)

    # Refraction (glsl:336-345), symbol-for-symbol.
    _n2 = jnp.where(inner_m[:, None], normal, -normal)  # glsl's _normal
    y_cap = _n2 * cos_theta[:, None]
    x_cap = d - y_cap
    refr_raw = (
        ratio_sin[:, None] * _n2
        + jnp.sqrt(jnp.maximum(1.0 - ratio_sin * ratio_sin, 0.0))[:, None] * x_cap
    )
    refr_base = linalg.normalize(refr_raw, eps=1e-20)
    refr_dir = sampling.fibonacci_hemisphere(sample_idx, spp, scat_rfr, refr_base)
    spawn_refr = did_hit & (bounced < cfg.max_bounces) & ~tir
    spawn_refr = spawn_refr & (contrib * refr_c > 0.0)

    # Local term: contribution^2 * albedo (glsl:250 + :304).
    add_color = add_color + jnp.where(
        did_hit[:, None], (contrib * contrib)[:, None] * mat_color, 0.0
    )

    return ShadeResult(
        add_color=add_color,
        set_white=set_white,
        hit_t=jnp.where(hit.hit, hit.t, cfg.t_max),
        did_hit=did_hit,
        missed=missed,
        refr_mask=spawn_refr,
        refr_o=hit_point + 1e-4 * _n2,  # glsl:349-350 (+eps along _normal)
        refr_d=refr_dir,
        refr_contrib=contrib * refr_c,
        refl_mask=spawn_refl,
        refl_o=hit_point - 1e-4 * _n2,
        refl_d=refl_dir,
        refl_contrib=contrib * refl_c,
        bounced=bounced,
        refr_medium=target,
        # Exiting beyond the tracked depth approximates grandparent = air.
        refr_parent=jnp.where(inner_m, jnp.ones_like(medium), medium),
        refl_medium=medium,
        refl_parent=parent_medium,
    )


def _process_pop(scene, lights, cfg: RenderConfig, queue, state, sample_idx, spp, time_ratio, accel=None):
    """One queue step: pop LIFO top of every lane, shade, push children.
    Returns ``(queue, state, n_dropped)``."""
    color, depth, done, primary_t = state
    queue, active, o, d, contrib, bounced, medium, parent_medium = queue.pop()
    active = active & ~done
    is_primary = active & (bounced == 0)

    r = shade_rays(
        scene, lights, cfg, accel, o, d, contrib, bounced, active, sample_idx,
        time_ratio, medium, parent_medium,
    )
    if cfg.shading == "materials":
        # Reference pushes reflected THEN refracted (03_Shadows glsl:347-352);
        # LIFO pops the refraction first.
        queue, d1 = queue.push(r.refl_mask, r.refl_o, r.refl_d, r.refl_contrib,
                               r.bounced, r.refl_medium, r.refl_parent)
        queue, d2 = queue.push(r.refr_mask, r.refr_o, r.refr_d, r.refr_contrib,
                               r.bounced, r.refr_medium, r.refr_parent)
    else:
        # Push refraction then reflection (reference order; LIFO pops reflect
        # first, 01_BVH glsl:553-592).
        queue, d1 = queue.push(r.refr_mask, r.refr_o, r.refr_d, r.refr_contrib,
                               r.bounced)
        queue, d2 = queue.push(r.refl_mask, r.refl_o, r.refl_d, r.refl_contrib,
                               r.bounced)

    color = color + r.add_color
    color = jnp.where(r.set_white[:, None], jnp.ones_like(color), color)
    done = done | r.set_white
    primary_t = jnp.where(is_primary, r.hit_t, primary_t)
    depth = jnp.where(r.missed, cfg.t_max, depth)
    depth = jnp.where(r.did_hit, r.hit_t, depth)
    return queue, (color, depth, done, primary_t), d1 + d2


# ----------------------------------------------------------------------------
# Entry points
# ----------------------------------------------------------------------------


def _build_accel(scene, cfg: RenderConfig):
    if cfg.intersector == "bvh":
        from raytracing_tests_tpu.bvh.build import build_lbvh

        return build_lbvh(scene)
    if cfg.intersector == "pallas":
        if cfg.diff_mode:
            from raytracing_tests_tpu.diff.fastpath import (
                fastpath_eligible, make_diff_accel)

            # render_loss only sets diff_mode when fastpath_eligible (the
            # shared predicate); assert the two sites stay in lockstep.
            assert fastpath_eligible(cfg), cfg
            return make_diff_accel(scene, has_motion=cfg.has_motion,
                                   mode=cfg.pallas_mode,
                                   probe_rows=cfg.probe_rows)
        if cfg.pallas_v2 and cfg.pallas_mode == "spheres":
            from raytracing_tests_tpu.kernels.sweep2 import make_accel2

            return make_accel2(scene, has_motion=cfg.has_motion,
                               probe_rows=cfg.probe_rows)
        from raytracing_tests_tpu.kernels.sweep import make_accel

        return make_accel(
            scene, cfg.pallas_mode, group=cfg.pallas_groups, has_motion=cfg.has_motion
        )
    return None


def trace_lanes(scene, lights, cfg: RenderConfig, o, d, time_ratio, sample_idx, accel=None,
                return_pops: bool = False):
    """Trace a flat batch of lanes. ``o, d: (B, 3)``; returns
    ``(color (B, 3), primary_t (B,), rays (scalar i32), dropped (scalar i32))``
    where ``rays`` counts the rays actually processed (active pops) — the
    honest rays/s numerator — and ``dropped`` counts children lost to the
    fixed queue capacity (the reference stack drops the same rays).

    ``return_pops``: append the number of pop steps actually taken (the
    early-exit ``k``; == ``cfg.pops`` under the scan) — the probe behind
    ``diff.train.probe_max_pops``."""
    B = o.shape[0]
    if accel is None and cfg.intersector != "brute":
        accel = _build_accel(scene, cfg)
    if cfg.show_normals:
        t_limit = jnp.full((B,), cfg.t_max, jnp.float32)
        hit = _nearest(scene, accel, o, d, time_ratio, t_limit)
        col = jnp.where(hit.hit[:, None], hit.normal, 0.0)
        return col, jnp.where(hit.hit, hit.t, cfg.t_max), jnp.int32(B), jnp.int32(0)

    queue = RayQueue.create(B, cfg.queue_capacity)
    queue, _ = queue.push(
        jnp.ones(B, bool), o, d, jnp.ones(B, jnp.float32), jnp.zeros(B, jnp.int32)
    )
    state = (
        jnp.zeros((B, 3), jnp.float32),  # accumulated color
        jnp.full((B,), cfg.t_max, jnp.float32),  # last-written depth
        jnp.zeros((B,), bool),  # emissive abort
        jnp.full((B,), cfg.t_max, jnp.float32),  # primary hit t
    )

    # Most lanes' queues drain after 2-3 pops (sky lanes after 1), so the
    # forward pass exits as soon as every queue is empty instead of running
    # the full static pop budget.  while_loop is not reverse-mode
    # differentiable, so gradient rendering falls back to a scan.
    def step(carry):
        queue, state, rays, dropped, k = carry
        n_active = jnp.sum((queue.size > 0).astype(jnp.int32))
        queue, state, n_drop = _process_pop(
            scene, lights, cfg, queue, state, sample_idx, cfg.spp, time_ratio, accel
        )
        return (queue, state, rays + n_active, dropped + n_drop, k + 1)

    init = (queue, state, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    if cfg.early_exit:
        queue, state, rays, dropped, k_used = jax.lax.while_loop(
            lambda c: (c[4] < cfg.pops) & jnp.any(c[0].size > 0), step, init
        )
    else:
        (queue, state, rays, dropped, k_used), _ = jax.lax.scan(
            lambda c, _: (step(c), None), init, None, length=cfg.pops
        )
    color, depth, done, primary_t = state
    if return_pops:
        return color, primary_t, rays, dropped, k_used
    return color, primary_t, rays, dropped


def _lane_inputs(camera, cfg: RenderConfig):
    """Flattened per-lane primary rays + sample metadata."""
    H, W, S = cfg.height, cfg.width, cfg.spp
    o, d, time_ratio = primary_rays(camera, W, H, S, cfg.aa_grid)
    B = H * W * S
    sample_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (H, W, S))
    return (
        o.reshape(B, 3),
        d.reshape(B, 3),
        time_ratio.reshape(B),
        sample_idx.reshape(B),
    )


def render_samples(scene, camera, cfg: RenderConfig, lights=None):
    """Render per-(pixel,sample) colors: returns (H, W, S, 3) plus depth.

    When ``cfg.lane_chunk`` is set, lanes are processed in fixed-size chunks
    under ``lax.map`` so peak memory is bounded by chunk x objects — the
    TPU-native analogue of the reference's spiral tile scheduler
    (``materials.cpp:100-120``: bounded work per dispatch).
    """
    H, W, S = cfg.height, cfg.width, cfg.spp
    o, d, time_ratio, sample_idx = _lane_inputs(camera, cfg)
    B = H * W * S
    accel = _build_accel(scene, cfg)

    if cfg.lane_chunk is None or cfg.lane_chunk >= B:
        color, primary_t, _, _ = trace_lanes(
            scene, lights, cfg, o, d, time_ratio, sample_idx, accel
        )
        return color.reshape(H, W, S, 3), primary_t.reshape(H, W, S)

    chunk = cfg.lane_chunk
    n_chunks = -(-B // chunk)
    pad = n_chunks * chunk - B

    def pad_to(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x

    xs = tuple(
        pad_to(x).reshape(n_chunks, chunk, *x.shape[1:])
        for x in (o, d, time_ratio, sample_idx)
    )

    def body(args):
        co, pt, _, _ = trace_lanes(scene, lights, cfg, *args, accel)
        return co, pt

    color, primary_t = jax.lax.map(body, xs)
    color = color.reshape(-1, 3)[:B]
    primary_t = primary_t.reshape(-1)[:B]
    return color.reshape(H, W, S, 3), primary_t.reshape(H, W, S)


def render_stats(scene, camera, cfg: RenderConfig, lights=None):
    """Render + throughput accounting: dict(image, depth, rays) where ``rays``
    is the number of rays actually traced (active queue pops, i.e. primary +
    secondary rays; the honest numerator for Mrays/s)."""
    H, W, S = cfg.height, cfg.width, cfg.spp
    o, d, time_ratio, sample_idx = _lane_inputs(camera, cfg)
    B = H * W * S
    accel = _build_accel(scene, cfg)
    chunk = cfg.lane_chunk or B
    if chunk >= B:
        color, primary_t, rays, dropped = trace_lanes(
            scene, lights, cfg, o, d, time_ratio, sample_idx, accel
        )
    else:
        n_chunks = -(-B // chunk)
        pad = n_chunks * chunk - B

        def pad_to(x):
            return (
                jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
                if pad
                else x
            )

        xs = tuple(
            pad_to(x).reshape(n_chunks, chunk, *x.shape[1:])
            for x in (o, d, time_ratio, sample_idx)
        )
        color, primary_t, rays, dropped = jax.lax.map(
            lambda args: trace_lanes(scene, lights, cfg, *args, accel), xs
        )
        color = color.reshape(-1, 3)[:B]
        primary_t = primary_t.reshape(-1)[:B]
        # Each zero-direction padding lane costs exactly one (missing) pop.
        rays = jnp.sum(rays) - pad
        dropped = jnp.sum(dropped)
    out = finalize(color.reshape(H, W, S, 3), primary_t.reshape(H, W, S), cfg)
    out["rays"] = rays
    out["rays_dropped"] = dropped
    return out


def finalize(colors, depths, cfg: RenderConfig):
    """Per-sample gamma then mean over the sample axis; mid-sample depth."""
    if cfg.show_normals:
        image = jnp.mean(colors, axis=2)
    elif cfg.diff_mode:
        # Gradient-safe gamma: sqrt(maximum(x, 0)) backward is
        # 0.5/sqrt(0) * 0 = inf * 0 = NaN wherever a trained color drives
        # a sample's accumulated channel NEGATIVE (observed poisoning adam
        # state 5 steps into color recovery).  The 1e-12 floor makes the
        # clamped branch's gradient an exact 0 (the max picks the constant
        # side) at a sqrt(1e-12) = 1e-6 image bias on pure-black samples —
        # diff mode only, the forward render stays bit-exact.
        image = jnp.mean(jnp.sqrt(jnp.maximum(colors, 1e-12)), axis=2)
    else:
        image = jnp.mean(jnp.sqrt(jnp.maximum(colors, 0.0)), axis=2)
    depth = depths[:, :, cfg.spp // 2]  # the reference stores the mid sample
    return {"image": image, "depth": depth}


def render(scene: Scene, camera: Camera, cfg: RenderConfig, lights: Optional[Lights] = None):
    """Full render: per-sample gamma then mean over the sample axis.

    Returns dict(image=(H, W, 3) in [0,1] (row 0 = bottom), depth=(H, W)).
    The reference applies sqrt per sample before the shared-memory mean
    (01_BVH glsl:696-701); we keep that order bit-for-bit.
    """
    colors, depths = render_samples(scene, camera, cfg, lights)
    return finalize(colors, depths, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def render_jit(scene, camera, cfg: RenderConfig, lights=None):
    return render(scene, camera, cfg, lights)
