"""Pallas nearest-hit / occlusion / refractive-index sweep kernels.

Design (TPU-first, cf. pallas_guide):
  - Lanes live as seven (R, 128) f32 planes (SoA: ox..oz, dx..dz, tr); a
    grid step processes an (RB, 128) block = RB*128 rays entirely in VMEM.
  - The scene is ONE (F, N) f32 table in SMEM (scalar memory): the object
    loop reads per-object scalars and applies them to the whole lane block —
    a broadcast FMA per field, zero gathers, zero HBM traffic per object.
  - Two modes, chosen statically per scene (``RenderConfig.for_scene``):
      'spheres'  — isotropic untextured ellipsoids: world-space quadratic,
                   ~30 VPU ops per lane-object (the iow-final cover scene).
      'generic'  — rotated ellipsoids/cuboids: inverse-rotation transform +
                   both primitive tests, ~110 ops (exact ``intersect_brute``
                   semantics, ``02_Groups/computeShaderSrc.glsl:65-90``).
  - The per-lane best (t, obj) update is two selects; material/normal data
    is fetched OUTSIDE the kernel by the caller (small-table gathers).

The XLA dense sweep (``ops.intersect``) materializes (B, N, 3) local-frame
intermediates in HBM — measured 2.46 s/frame at 400x225x4spp on v5e. These
kernels keep everything resident and are compute-bound instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tests_tpu.core import geometry, linalg
from raytracing_tests_tpu.ops.intersect import Hit

BIG_T = 3.0e38  # python float: jnp scalars become captured consts inside kernels
from raytracing_tests_tpu.scene.types import Scene

LANE = 128
DEFAULT_RB = 32  # sublane rows per block -> 4096 lanes/block

# (F, N) scene-table row indices, sphere mode.
S_CX, S_CY, S_CZ, S_R2, S_DPX, S_DPY, S_DPZ, S_VALID, S_RI = range(9)
SPHERE_ROWS = 9

# generic mode rows: position, rotation (row-major), scale, delta, type, valid, ri
(
    G_PX, G_PY, G_PZ,
    G_R00, G_R01, G_R02, G_R10, G_R11, G_R12, G_R20, G_R21, G_R22,
    G_SX, G_SY, G_SZ,
    G_DPX, G_DPY, G_DPZ,
    G_TYPE, G_VALID, G_RI,
) = range(21)
GENERIC_ROWS = 21


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Scene table packing (host/trace side)
# ---------------------------------------------------------------------------


def scene_mode(scene: Scene) -> str:
    """'spheres' when every valid object is an isotropic ellipsoid and either
    untextured or unrotated (rotation only affects texture coordinates on an
    isotropic sphere). Host-side: requires a concrete scene."""
    valid = np.asarray(scene.valid)
    if not valid.any():
        return "generic"
    ot = np.asarray(scene.obj_type)[valid]
    sc = np.asarray(scene.scale)[valid]
    iso = np.allclose(sc, sc[:, :1])
    spheres = (ot == geometry.ELLIPSOID).all() and iso
    if not spheres:
        return "generic"
    if scene.textures is not None and (np.asarray(scene.texture_index)[valid] > 0).any():
        rot = np.asarray(scene.rotation)[valid]
        if not np.allclose(rot, np.eye(3), atol=1e-6):
            return "generic"
    return "spheres"


def pack_scene_table(scene: Scene, mode: str):
    """Scene SoA -> (F, N) f32 table (traced-compatible; pure jnp)."""
    v = scene.valid.astype(jnp.float32)
    if mode == "spheres":
        r = scene.scale[:, 0]
        rows = [
            scene.position[:, 0], scene.position[:, 1], scene.position[:, 2],
            r * r,
            scene.delta_position[:, 0], scene.delta_position[:, 1], scene.delta_position[:, 2],
            v,
            scene.refractive_index,
        ]
    else:
        R = scene.rotation
        rows = [
            scene.position[:, 0], scene.position[:, 1], scene.position[:, 2],
            R[:, 0, 0], R[:, 0, 1], R[:, 0, 2],
            R[:, 1, 0], R[:, 1, 1], R[:, 1, 2],
            R[:, 2, 0], R[:, 2, 1], R[:, 2, 2],
            scene.scale[:, 0], scene.scale[:, 1], scene.scale[:, 2],
            scene.delta_position[:, 0], scene.delta_position[:, 1], scene.delta_position[:, 2],
            scene.obj_type.astype(jnp.float32),
            v,
            scene.refractive_index,
        ]
    return jnp.stack(rows).astype(jnp.float32)


def _pad_lanes(arrs, rb):
    """Flat (B,) lane arrays -> (R, 128) planes padded to RB rows; returns
    (planes, B, R)."""
    B = arrs[0].shape[0]
    block = rb * LANE
    Bp = -(-B // block) * block
    out = []
    for a in arrs:
        if Bp != B:
            a = jnp.concatenate([a, jnp.zeros((Bp - B,), a.dtype)])
        out.append(a.reshape(Bp // LANE, LANE))
    return out, B, Bp // LANE


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _sphere_t(table, i, ox, oy, oz, dx, dy, dz, omt, a):
    """Nearest-positive hit t for sphere i against the lane block."""
    rx = ox - table[S_CX, i] + omt * table[S_DPX, i]
    ry = oy - table[S_CY, i] + omt * table[S_DPY, i]
    rz = oz - table[S_CZ, i] + omt * table[S_DPZ, i]
    half_b = rx * dx + ry * dy + rz * dz
    c = rx * rx + ry * ry + rz * rz - table[S_R2, i]
    disc = half_b * half_b - a * c
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-half_b - sq) * pl.reciprocal(a, approx=False)
    t1 = (-half_b + sq) * pl.reciprocal(a, approx=False)
    t = jnp.where((t0 > t1) | (t0 < 0.0), t1, t0)
    return jnp.where(ok & (t > 0.0) & (table[S_VALID, i] > 0.0), t, BIG_T)


def _generic_t(table, i, ox, oy, oz, dx, dy, dz, omt):
    """Exact intersect_brute per-object semantics: R^T transform, then both
    ellipsoid and cuboid tests selected by type."""
    rx = ox - table[G_PX, i] + omt * table[G_DPX, i]
    ry = oy - table[G_PY, i] + omt * table[G_DPY, i]
    rz = oz - table[G_PZ, i] + omt * table[G_DPZ, i]
    r00, r01, r02 = table[G_R00, i], table[G_R01, i], table[G_R02, i]
    r10, r11, r12 = table[G_R10, i], table[G_R11, i], table[G_R12, i]
    r20, r21, r22 = table[G_R20, i], table[G_R21, i], table[G_R22, i]
    # local = R^T @ rel  (column dot products)
    lox = r00 * rx + r10 * ry + r20 * rz
    loy = r01 * rx + r11 * ry + r21 * rz
    loz = r02 * rx + r12 * ry + r22 * rz
    ldx = r00 * dx + r10 * dy + r20 * dz
    ldy = r01 * dx + r11 * dy + r21 * dz
    ldz = r02 * dx + r12 * dy + r22 * dz
    sx, sy, sz = table[G_SX, i], table[G_SY, i], table[G_SZ, i]

    # Ellipsoid quadratic in scaled space (geometry.ray_ellipsoid_t).
    ex, ey, ez = lox / sx, loy / sy, loz / sz
    fx, fy, fz = ldx / sx, ldy / sy, ldz / sz
    a = fx * fx + fy * fy + fz * fz
    half_b = ex * fx + ey * fy + ez * fz
    c = ex * ex + ey * ey + ez * ez - 1.0
    disc = half_b * half_b - a * c
    ok = (disc > 0.0) & (a > 1e-30)
    a_safe = jnp.where(ok, a, 1.0)
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    t0 = (-half_b - sq) / a_safe
    t1 = (-half_b + sq) / a_safe
    t_e = jnp.where((t0 > t1) | (t0 < 0.0), t1, t0)
    t_e = jnp.where(ok & (t_e > 0.0), t_e, BIG_T)

    # Cuboid slab test (geometry.ray_cuboid_t, safe-inverse convention).
    def axis(lo, ld, s):
        eps = 1e-12
        ld_safe = jnp.where(jnp.abs(ld) < eps, jnp.where(ld >= 0.0, eps, -eps), ld)
        inv = 1.0 / ld_safe
        u = (-0.5 * s - lo) * inv
        w = (0.5 * s - lo) * inv
        return jnp.minimum(u, w), jnp.maximum(u, w)

    n1, x1 = axis(lox, ldx, sx)
    n2, x2 = axis(loy, ldy, sy)
    n3, x3 = axis(loz, ldz, sz)
    tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
    tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
    t_c = jnp.where(tmax > tmin, jnp.where(tmin > 0.0, tmin, tmax), BIG_T)
    t_c = jnp.where(t_c > 0.0, t_c, BIG_T)

    typ = table[G_TYPE, i]
    t = jnp.where(typ == float(geometry.ELLIPSOID), t_e,
                  jnp.where(typ == float(geometry.CUBOID), t_c, BIG_T))
    return jnp.where(table[G_VALID, i] > 0.0, t, BIG_T)


def _nearest_kernel(mode: str, n_obj: int):
    def kernel(table_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tr_ref, tlim_ref, t_out, obj_out):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        omt = 1.0 - tr_ref[:]
        table = table_ref
        a = dx * dx + dy * dy + dz * dz
        a = jnp.maximum(a, 1e-30)  # dead/padded lanes carry d = 0

        def body(i, carry):
            t_best, obj_best = carry
            if mode == "spheres":
                t = _sphere_t(table, i, ox, oy, oz, dx, dy, dz, omt, a)
            else:
                t = _generic_t(table, i, ox, oy, oz, dx, dy, dz, omt)
            better = t < t_best
            return jnp.where(better, t, t_best), jnp.where(better, i, obj_best)

        t0 = jnp.minimum(jnp.full(ox.shape, BIG_T), tlim_ref[:])
        o0 = jnp.full(ox.shape, -1, jnp.int32)
        t_best, obj_best = jax.lax.fori_loop(0, n_obj, body, (t0, o0))
        t_out[:] = t_best
        obj_out[:] = obj_best

    return kernel


def _nearest_ri_kernel(n_obj: int):
    """Fused sphere-mode kernel: nearest hit AND surrounding-RI at the hit
    point in one pass (saves a kernel launch + re-reading 7 lane planes).

    Phase 1 tracks the winning sphere's motion-shifted center via selects, so
    the RI query point ``hit + 1e-3 * normal`` is computable in-kernel with
    no gather.  Miss lanes probe a far-away point -> no containment -> RI 1.
    """

    def kernel(table_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tr_ref, tlim_ref, t_out, obj_out, ri_out):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        omt = 1.0 - tr_ref[:]
        table = table_ref
        a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)

        def body(i, carry):
            t_best, obj_best, bcx, bcy, bcz = carry
            cx = table[S_CX, i] - omt * table[S_DPX, i]  # motion-shifted center
            cy = table[S_CY, i] - omt * table[S_DPY, i]
            cz = table[S_CZ, i] - omt * table[S_DPZ, i]
            rx, ry, rz = ox - cx, oy - cy, oz - cz
            half_b = rx * dx + ry * dy + rz * dz
            c = rx * rx + ry * ry + rz * rz - table[S_R2, i]
            disc = half_b * half_b - a * c
            ok = disc > 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = pl.reciprocal(a, approx=False)
            t0 = (-half_b - sq) * inv_a
            t1 = (-half_b + sq) * inv_a
            t = jnp.where((t0 > t1) | (t0 < 0.0), t1, t0)
            t = jnp.where(ok & (t > 0.0) & (table[S_VALID, i] > 0.0), t, BIG_T)
            better = t < t_best
            return (
                jnp.where(better, t, t_best),
                jnp.where(better, i, obj_best),
                jnp.where(better, cx, bcx),
                jnp.where(better, cy, bcy),
                jnp.where(better, cz, bcz),
            )

        zeros = jnp.zeros(ox.shape, jnp.float32)
        t0v = jnp.minimum(jnp.full(ox.shape, BIG_T), tlim_ref[:])
        o0 = jnp.full(ox.shape, -1, jnp.int32)
        t_best, obj_best, bcx, bcy, bcz = jax.lax.fori_loop(
            0, n_obj, body, (t0v, o0, zeros, zeros, zeros)
        )

        # RI query point: hit + 1e-3 * unit(hit - center).
        px = ox + t_best * dx
        py = oy + t_best * dy
        pz = oz + t_best * dz
        nx, ny, nz = px - bcx, py - bcy, pz - bcz
        inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
        qx = px + 1e-3 * nx * inv_n
        qy = py + 1e-3 * ny * inv_n
        qz = pz + 1e-3 * nz * inv_n

        def ri_body(i, carry):
            acc, cnt = carry
            rx = qx - table[S_CX, i] + omt * table[S_DPX, i]
            ry = qy - table[S_CY, i] + omt * table[S_DPY, i]
            rz = qz - table[S_CZ, i] + omt * table[S_DPZ, i]
            inside = (rx * rx + ry * ry + rz * rz <= table[S_R2, i]) & (
                table[S_VALID, i] > 0.0
            )
            return acc + jnp.where(inside, table[S_RI, i], 0.0), cnt + inside.astype(
                jnp.float32
            )

        acc, cnt = jax.lax.fori_loop(0, n_obj, ri_body, (zeros, zeros))
        t_out[:] = t_best
        obj_out[:] = obj_best
        ri_out[:] = jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)

    return kernel


def _grouped_nearest_ri_kernel(n_obj: int, n_groups: int, group: int, with_ri: bool,
                               has_motion: bool = True, mode: str = "spheres"):
    """Two-level sweep: Morton-ordered object GROUPS with precomputed
    AABBs; a whole lane block skips a group when no lane's ray enters its
    AABB (``@pl.when`` on a block-wide any()).

    This is the TPU-native shape of BVH culling: per-lane divergence is
    impossible on the VPU, but pixel-tile lane blocks are spatially coherent,
    so block-granular culling recovers most of the benefit — sky blocks test
    16 AABBs instead of 512 spheres.  Mirrors the role of the reference's
    node-level ``TestIntersectAABB`` (01_BVH glsl:187-210) at block scope.

    ``mode='generic'`` runs the full rotated cuboid/ellipsoid test
    (``_generic_t``, the flagship traversal's ``IntersectRay`` — 01_BVH
    glsl:434-475 serving all geometry) per surviving group; fused RI is
    sphere-only (generic dielectric scenes take the separate RI sweep).
    """
    assert mode == "spheres" or not with_ri

    def kernel(table_ref, gaabb_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
               dz_ref, tr_ref, tlim_ref, t_out, obj_out, ri_out,
               t_sc, obj_sc, bcx_sc, bcy_sc, bcz_sc, acc_sc, cnt_sc):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        omt = 1.0 - tr_ref[:]
        table = table_ref
        a = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)
        eps = 1e-12
        inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx >= 0, eps, -eps), dx)
        inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy >= 0, eps, -eps), dy)
        inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz >= 0, eps, -eps), dz)

        t_sc[:] = jnp.minimum(jnp.full(ox.shape, BIG_T), tlim_ref[:])
        obj_sc[:] = jnp.full(ox.shape, -1, jnp.int32)
        bcx_sc[:] = jnp.zeros(ox.shape, jnp.float32)
        bcy_sc[:] = jnp.zeros(ox.shape, jnp.float32)
        bcz_sc[:] = jnp.zeros(ox.shape, jnp.float32)

        def group_body(g, _):
            lx, ly, lz = gaabb_ref[0, g], gaabb_ref[1, g], gaabb_ref[2, g]
            hx, hy, hz = gaabb_ref[3, g], gaabb_ref[4, g], gaabb_ref[5, g]
            u1 = (lx - ox) * inv_dx
            w1 = (hx - ox) * inv_dx
            u2 = (ly - oy) * inv_dy
            w2 = (hy - oy) * inv_dy
            u3 = (lz - oz) * inv_dz
            w3 = (hz - oz) * inv_dz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(u1, w1), jnp.minimum(u2, w2)),
                jnp.minimum(u3, w3),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(u1, w1), jnp.maximum(u2, w2)),
                jnp.maximum(u3, w3),
            )
            ghit = (tmax > tmin) & (tmin < t_sc[:])

            @pl.when(jnp.any(ghit))
            def _():
                def obj_body(j, _):
                    i = g * group + j
                    if mode != "spheres":
                        t = _generic_t(table, i, ox, oy, oz, dx, dy, dz, omt)
                        better = t < t_sc[:]
                        t_sc[:] = jnp.where(better, t, t_sc[:])
                        obj_sc[:] = jnp.where(better, i, obj_sc[:])
                        return 0
                    if has_motion:
                        cx = table[S_CX, i] - omt * table[S_DPX, i]
                        cy = table[S_CY, i] - omt * table[S_DPY, i]
                        cz = table[S_CZ, i] - omt * table[S_DPZ, i]
                    else:  # static scene: skip 6 broadcast FMAs per object
                        cx = table[S_CX, i]
                        cy = table[S_CY, i]
                        cz = table[S_CZ, i]
                    rx, ry, rz = ox - cx, oy - cy, oz - cz
                    half_b = rx * dx + ry * dy + rz * dz
                    c = rx * rx + ry * ry + rz * rz - table[S_R2, i]
                    disc = half_b * half_b - a * c
                    ok = disc > 0.0
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    inv_a = pl.reciprocal(a, approx=False)
                    t0 = (-half_b - sq) * inv_a
                    t1 = (-half_b + sq) * inv_a
                    t = jnp.where((t0 > t1) | (t0 < 0.0), t1, t0)
                    t = jnp.where(
                        ok & (t > 0.0) & (table[S_VALID, i] > 0.0), t, BIG_T
                    )
                    better = t < t_sc[:]
                    t_sc[:] = jnp.where(better, t, t_sc[:])
                    obj_sc[:] = jnp.where(better, i, obj_sc[:])
                    bcx_sc[:] = jnp.where(better, cx, bcx_sc[:])
                    bcy_sc[:] = jnp.where(better, cy, bcy_sc[:])
                    bcz_sc[:] = jnp.where(better, cz, bcz_sc[:])
                    return 0

                jax.lax.fori_loop(0, group, obj_body, 0)

            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)

        t_best = t_sc[:]
        t_out[:] = t_best
        obj_out[:] = obj_sc[:]

        if with_ri:
            px = ox + t_best * dx
            py = oy + t_best * dy
            pz = oz + t_best * dz
            nx, ny, nz = px - bcx_sc[:], py - bcy_sc[:], pz - bcz_sc[:]
            inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
            qx = px + 1e-3 * nx * inv_n
            qy = py + 1e-3 * ny * inv_n
            qz = pz + 1e-3 * nz * inv_n
            acc_sc[:] = jnp.zeros(ox.shape, jnp.float32)
            cnt_sc[:] = jnp.zeros(ox.shape, jnp.float32)

            def ri_group(g, _):
                lx, ly, lz = gaabb_ref[0, g], gaabb_ref[1, g], gaabb_ref[2, g]
                hx, hy, hz = gaabb_ref[3, g], gaabb_ref[4, g], gaabb_ref[5, g]
                in_box = (
                    (qx >= lx) & (qx <= hx)
                    & (qy >= ly) & (qy <= hy)
                    & (qz >= lz) & (qz <= hz)
                )

                @pl.when(jnp.any(in_box))
                def _():
                    def ri_obj(j, _):
                        i = g * group + j
                        if has_motion:
                            rx = qx - table[S_CX, i] + omt * table[S_DPX, i]
                            ry = qy - table[S_CY, i] + omt * table[S_DPY, i]
                            rz = qz - table[S_CZ, i] + omt * table[S_DPZ, i]
                        else:
                            rx = qx - table[S_CX, i]
                            ry = qy - table[S_CY, i]
                            rz = qz - table[S_CZ, i]
                        inside = (
                            rx * rx + ry * ry + rz * rz <= table[S_R2, i]
                        ) & (table[S_VALID, i] > 0.0)
                        acc_sc[:] = acc_sc[:] + jnp.where(inside, table[S_RI, i], 0.0)
                        cnt_sc[:] = cnt_sc[:] + inside.astype(jnp.float32)
                        return 0

                    jax.lax.fori_loop(0, group, ri_obj, 0)

                return 0

            jax.lax.fori_loop(0, n_groups, ri_group, 0)
            ri_out[:] = jnp.where(
                acc_sc[:] > 1.0, acc_sc[:] / jnp.maximum(cnt_sc[:], 1.0), 1.0
            )
        else:
            ri_out[:] = jnp.ones(ox.shape, jnp.float32)

    return kernel


def _ri_kernel(mode: str, n_obj: int):
    """Surrounding-RI point sweep: accumulate RI of containing objects."""

    def kernel(table_ref, px_ref, py_ref, pz_ref, tr_ref, acc_out, cnt_out):
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
        omt = 1.0 - tr_ref[:]
        table = table_ref

        def body(i, carry):
            acc, cnt = carry
            if mode == "spheres":
                rx = px - table[S_CX, i] + omt * table[S_DPX, i]
                ry = py - table[S_CY, i] + omt * table[S_DPY, i]
                rz = pz - table[S_CZ, i] + omt * table[S_DPZ, i]
                ri = table[S_RI, i]
                # RI-1 containers are air: they cannot move the result off
                # the neutral 1.0 (same convention as sweep2._ri_probe's
                # dielectric-only sub-table and the CPU oracle).
                inside = (rx * rx + ry * ry + rz * rz <= table[S_R2, i]) & (
                    table[S_VALID, i] > 0.0
                ) & (ri != 1.0)
            else:
                rx = px - table[G_PX, i] + omt * table[G_DPX, i]
                ry = py - table[G_PY, i] + omt * table[G_DPY, i]
                rz = pz - table[G_PZ, i] + omt * table[G_DPZ, i]
                lox = (table[G_R00, i] * rx + table[G_R10, i] * ry + table[G_R20, i] * rz) / table[G_SX, i]
                loy = (table[G_R01, i] * rx + table[G_R11, i] * ry + table[G_R21, i] * rz) / table[G_SY, i]
                loz = (table[G_R02, i] * rx + table[G_R12, i] * ry + table[G_R22, i] * rz) / table[G_SZ, i]
                typ = table[G_TYPE, i]
                in_e = lox * lox + loy * loy + loz * loz <= 1.0
                in_c = (jnp.abs(lox) <= 0.5) & (jnp.abs(loy) <= 0.5) & (jnp.abs(loz) <= 0.5)
                inside = jnp.where(
                    typ == float(geometry.ELLIPSOID), in_e,
                    jnp.where(typ == float(geometry.CUBOID), in_c, False),
                ) & (table[G_VALID, i] > 0.0)
                ri = table[G_RI, i]
                inside = inside & (ri != 1.0)  # RI-1 containers are air
            acc = acc + jnp.where(inside, ri, 0.0)
            cnt = cnt + inside.astype(jnp.float32)
            return acc, cnt

        acc, cnt = jax.lax.fori_loop(
            0, n_obj, body, (jnp.zeros(px.shape, jnp.float32),) * 2
        )
        acc_out[:] = acc
        cnt_out[:] = cnt

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _run_sweep(kernel, n_out, out_dtypes, table, lane_planes, rb):
    R = lane_planes[0].shape[0]
    grid = (R // rb,)
    lane_spec = pl.BlockSpec((rb, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(
        table.shape, lambda g: (0, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[table_spec] + [lane_spec] * len(lane_planes),
        out_specs=tuple([lane_spec] * n_out),
        out_shape=tuple(
            jax.ShapeDtypeStruct((R, LANE), dt) for dt in out_dtypes
        ),
        interpret=_interpret(),
    )(table, *lane_planes)


def sweep_nearest(table, mode: str, o, d, time_ratio, t_limit, rb: int = DEFAULT_RB):
    """(t, obj) of the nearest hit per lane; table from ``pack_scene_table``."""
    n_obj = table.shape[1]
    planes, B, _ = _pad_lanes(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time_ratio, t_limit],
        rb,
    )
    t, obj = _run_sweep(
        _nearest_kernel(mode, n_obj), 2, (jnp.float32, jnp.int32), table, planes, rb
    )
    return t.reshape(-1)[:B], obj.reshape(-1)[:B]


def sweep_nearest_ri(table, o, d, time_ratio, t_limit, rb: int = DEFAULT_RB):
    """Fused sphere-mode sweep: (t, obj, surrounding_ri) in one kernel."""
    n_obj = table.shape[1]
    planes, B, _ = _pad_lanes(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time_ratio, t_limit],
        rb,
    )
    t, obj, ri = _run_sweep(
        _nearest_ri_kernel(n_obj), 3, (jnp.float32, jnp.int32, jnp.float32),
        table, planes, rb,
    )
    return t.reshape(-1)[:B], obj.reshape(-1)[:B], ri.reshape(-1)[:B]


def sweep_grouped(table, gaabb, o, d, time_ratio, t_limit, group: int,
                  with_ri: bool, rb: int = DEFAULT_RB, has_motion: bool = True,
                  mode: str = "spheres"):
    """Grouped two-level sweep -> (t, obj_sorted, ri)."""
    n_obj = table.shape[1]
    n_groups = gaabb.shape[1]
    assert n_groups * group == n_obj, (n_groups, group, n_obj)
    planes, B, R = _pad_lanes(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], time_ratio, t_limit],
        rb,
    )
    lane_spec = pl.BlockSpec((rb, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda g: (0, 0), memory_space=pltpu.SMEM)
    scratch = [pltpu.VMEM((rb, LANE), jnp.float32) for _ in range(2)]
    scratch.insert(1, pltpu.VMEM((rb, LANE), jnp.int32))  # t, obj, bcx..
    scratch += [pltpu.VMEM((rb, LANE), jnp.float32) for _ in range(4)]
    t, obj, ri = pl.pallas_call(
        _grouped_nearest_ri_kernel(n_obj, n_groups, group, with_ri, has_motion,
                                   mode),
        grid=(R // rb,),
        in_specs=[smem(table), smem(gaabb)] + [lane_spec] * 8,
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, LANE), jnp.int32),
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(table, gaabb, *planes)
    return t.reshape(-1)[:B], obj.reshape(-1)[:B], ri.reshape(-1)[:B]


def _sweep_dispatch(accel, o, d, time_ratio, t_limit, with_ri: bool):
    """(t, obj_sorted_or_plain, ri_or_None) across kernel variants."""
    if accel.group and accel.gaabb is not None:
        fused_ri = with_ri and accel.mode == "spheres"
        t, obj, ri = sweep_grouped(
            accel.table, accel.gaabb, o, d, time_ratio, t_limit, accel.group,
            fused_ri, has_motion=accel.has_motion, mode=accel.mode,
        )
        return t, obj, (ri if fused_ri else None)
    if with_ri and accel.mode == "spheres":
        t, obj, ri = sweep_nearest_ri(accel.table, o, d, time_ratio, t_limit)
        return t, obj, ri
    t, obj = sweep_nearest(accel.table, accel.mode, o, d, time_ratio, t_limit)
    return t, obj, None


def sweep_ri(table, mode: str, point, time_ratio, rb: int = DEFAULT_RB):
    n_obj = table.shape[1]
    planes, B, _ = _pad_lanes(
        [point[:, 0], point[:, 1], point[:, 2], time_ratio], rb
    )
    acc, cnt = _run_sweep(
        _ri_kernel(mode, n_obj), 2, (jnp.float32, jnp.float32), table, planes, rb
    )
    acc = acc.reshape(-1)[:B]
    cnt = cnt.reshape(-1)[:B]
    return jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)


# ---------------------------------------------------------------------------
# One-hot matmul gathers: per-lane object-field fetch on the MXU.
#
# XLA's native gather on TPU costs ~11-17 ms per pop at 262k lanes (measured
# v5e); a (B, N) one-hot times the (N, F) field matrix is exact in f32 (rows
# are 0/1) and runs in ~1-2 ms on the MXU, fetching ALL fields in one shot.
# ---------------------------------------------------------------------------


def pack_hit_matrix(scene: Scene, mode: str):
    """(N, F) f32 matrix of every field shading needs after a hit."""
    cols = [
        scene.position[:, 0], scene.position[:, 1], scene.position[:, 2],
        scene.delta_position[:, 0], scene.delta_position[:, 1], scene.delta_position[:, 2],
        scene.scale[:, 0], scene.scale[:, 1], scene.scale[:, 2],
        scene.color[:, 0], scene.color[:, 1], scene.color[:, 2],
        scene.refractive_index,
        scene.refractivity,
        scene.reflectivity,
        scene.scatter_refract,
        scene.scatter_reflect,
        scene.texture_index.astype(jnp.float32),
        scene.emissive.astype(jnp.float32),
        jnp.arange(scene.capacity, dtype=jnp.float32),  # original object id
    ]
    if mode != "spheres":
        R = scene.rotation
        cols += [R[:, i, j] for i in range(3) for j in range(3)]
        cols += [scene.obj_type.astype(jnp.float32)]
    return jnp.stack(cols, axis=1)


# pack_hit_matrix column indices
(
    H_PX, H_PY, H_PZ, H_DPX, H_DPY, H_DPZ, H_SX, H_SY, H_SZ,
    H_CR, H_CG, H_CB, H_RI, H_REFR, H_REFL, H_SCRFR, H_SCRFL, H_TEX, H_EMIS,
    H_OBJ,
) = range(20)
H_R00 = 20  # generic-mode extras: rotation rows 20..28, type 29
H_TYPE = 29


def onehot_gather(matrix, idx, split_bf16: bool = False):
    """(N, F) matrix, (B,) int32 indices -> (B, F) rows, via MXU matmul.

    ``split_bf16`` keeps the big (B, N) one-hot operand in bf16 with a
    3-term bf16 decomposition of the field matrix.  Exact on CPU, but OFF by
    default: measured on v5e it is both slower (2.6 vs 2.1 ms at 1M lanes —
    the f32 matmul is not bandwidth-bound here) and loses precision (XLA
    fuses the decomposition arithmetic differently on TPU).
    """
    N = matrix.shape[0]
    dn = (((1,), (0,)), ((), ()))
    if not split_bf16:
        oh = (idx[:, None] == jnp.arange(N, dtype=idx.dtype)[None, :]).astype(
            jnp.float32
        )
        return jax.lax.dot_general(oh, matrix, dn, preferred_element_type=jnp.float32)
    oh = (idx[:, None] == jnp.arange(N, dtype=idx.dtype)[None, :]).astype(jnp.bfloat16)
    # optimization_barrier: keeps --xla_allow_excess_precision from eliding
    # the f32->bf16->f32 round-trips (which zeroes mid/lo and quantizes the
    # gather to bf16); see pack_ftab_splits in sweep2.py.
    hi = jax.lax.optimization_barrier(matrix.astype(jnp.bfloat16))
    r1 = matrix - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for part in (hi, mid, lo):
        g = jax.lax.dot_general(oh, part, dn, preferred_element_type=jnp.float32)
        out = g if out is None else out + g
    return out


# ---------------------------------------------------------------------------
# intersect-module-compatible entry points
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class PallasAccel:
    """Bundle of packed scene table + hit matrix + optional group-culling
    data (array leaves) + mode/group (static aux); a pytree so it can cross
    jit/shard_map boundaries.  When ``group > 0`` the table rows are
    Morton-ordered and ``gaabb`` holds per-group AABBs; ``perm`` maps sorted
    positions back to original object ids."""

    def __init__(self, table, mode: str, hit_matrix=None, gaabb=None, perm=None,
                 group: int = 0, has_motion: bool = True):
        self.table = table
        self.mode = mode
        self.hit_matrix = hit_matrix
        self.gaabb = gaabb
        self.perm = perm
        self.group = group
        self.has_motion = has_motion

    def tree_flatten(self):
        return (self.table, self.hit_matrix, self.gaabb, self.perm), (
            self.mode, self.group, self.has_motion,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mode, group, has_motion = aux
        return cls(leaves[0], mode, leaves[1], leaves[2], leaves[3], group, has_motion)


from flax import struct


@struct.dataclass
class HitFields:
    """Per-lane material fields of the winning object (one MXU gather)."""

    color: jnp.ndarray  # (B, 3)
    refractive_index: jnp.ndarray  # (B,)
    refractivity: jnp.ndarray
    reflectivity: jnp.ndarray
    scatter_refract: jnp.ndarray
    scatter_reflect: jnp.ndarray
    texture_index: jnp.ndarray  # (B,) i32
    emissive: jnp.ndarray  # (B,) bool


SCENE_PERM_FIELDS = (
    "position", "rotation", "scale", "delta_position", "obj_type", "color",
    "refractive_index", "refractivity", "reflectivity", "scatter_refract",
    "scatter_reflect", "texture_index", "emissive", "valid",
)


def scene_has_motion(scene: Scene) -> bool:
    """Host-side: any valid object with a nonzero motion delta."""
    dp = np.asarray(scene.delta_position) * np.asarray(scene.valid)[:, None]
    return bool((np.abs(dp) > 0).any())


def make_accel(scene: Scene, mode: Optional[str] = None, group: int = 0,
               has_motion: bool = True) -> PallasAccel:
    mode = mode or scene_mode(scene)
    if group <= 0:
        return PallasAccel(
            pack_scene_table(scene, mode), mode, pack_hit_matrix(scene, mode)
        )

    # Morton-order the objects so consecutive groups are spatially tight
    # (invalid rows sort last), then pad to a group multiple.
    from raytracing_tests_tpu.bvh.build import morton3d

    lo, hi = scene.world_aabbs()
    valid = scene.valid
    big = jnp.max(jnp.where(valid[:, None], hi, -jnp.inf), axis=0)
    lo_v = jnp.where(valid[:, None], lo, big)
    hi_v = jnp.where(valid[:, None], hi, big)
    slo = jnp.min(lo_v, axis=0)
    sext = jnp.maximum(jnp.max(hi_v, axis=0) - slo, 1e-12)
    codes = morton3d(((lo_v + hi_v) * 0.5 - slo) / sext)
    # Huge objects (a ground sphere spans the whole scene) would bloat their
    # Morton group's AABB and defeat culling for everything sharing the
    # group: sort them FIRST into their own always-tested group(s), keeping
    # the remaining groups spatially tight.
    size = jnp.max(hi_v - lo_v, axis=-1) / jnp.max(sext)
    huge = (size > 0.5) & valid
    codes = jnp.where(valid, codes >> jnp.uint32(2), jnp.uint32(0x3FFFFFFF))
    key = jnp.where(huge, jnp.uint32(0), codes + jnp.uint32(1))
    order = jnp.argsort(key).astype(jnp.int32)

    perm_scene = scene.replace(
        **{f: getattr(scene, f)[order] for f in SCENE_PERM_FIELDS}
    )
    table = pack_scene_table(perm_scene, mode)
    hm = pack_hit_matrix(perm_scene, mode)
    hm = hm.at[:, H_OBJ].set(order.astype(jnp.float32))

    n = scene.capacity
    n_pad = -(-n // group) * group
    if n_pad != n:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], n_pad - n), jnp.float32)], axis=1
        )
        hm = jnp.concatenate([hm, jnp.zeros((n_pad - n, hm.shape[1]), jnp.float32)])

    # Per-group AABBs over the sorted (motion-swept) object boxes; padding
    # and invalid rows contribute empty boxes.
    INF = 3.0e38
    lo_s = jnp.where(valid[order][:, None], lo[order], INF)
    hi_s = jnp.where(valid[order][:, None], hi[order], -INF)
    if n_pad != n:
        lo_s = jnp.concatenate([lo_s, jnp.full((n_pad - n, 3), INF)])
        hi_s = jnp.concatenate([hi_s, jnp.full((n_pad - n, 3), -INF)])
    glo = jnp.min(lo_s.reshape(-1, group, 3), axis=1)  # (G, 3)
    ghi = jnp.max(hi_s.reshape(-1, group, 3), axis=1)
    gaabb = jnp.concatenate([glo.T, ghi.T], axis=0)  # (6, G)

    return PallasAccel(table, mode, hm, gaabb, order, group, has_motion)


def intersect_pallas_full(accel: PallasAccel, scene: Scene, o, d, time_ratio, t_limit):
    """Sweep + one MXU gather -> (Hit, HitFields). The Hit matches
    ``intersect_brute`` exactly; HitFields replaces the shading-side
    per-field gathers."""
    t, obj, _ = _sweep_dispatch(accel, o, d, time_ratio, t_limit, with_ri=False)
    return _finish_hit(accel, o, d, time_ratio, t, obj)


def _finish_hit(accel: PallasAccel, o, d, time_ratio, t, obj):
    hit = obj >= 0
    obj_s = jnp.maximum(obj, 0)  # index into the (possibly sorted) tables
    t_safe = jnp.where(hit, t, 1.0)

    rows = onehot_gather(accel.hit_matrix, obj_s)  # (B, F)
    pos = rows[:, H_PX : H_PZ + 1]
    dp = rows[:, H_DPX : H_DPZ + 1]
    scale = rows[:, H_SX : H_SZ + 1]
    shift = (1.0 - time_ratio)[:, None] * dp
    rel = o - pos + shift

    if accel.mode == "spheres":
        p_rel = rel + t_safe[:, None] * d  # hit point relative to moved center
        r = scale[:, 0:1]
        n_world = linalg.normalize(p_rel)
        p_local = p_rel / r
    else:
        # rotation columns (B, 3, 3) from the same gathered row.
        R = rows[:, H_R00 : H_R00 + 9].reshape(-1, 3, 3)
        otype = rows[:, H_TYPE].astype(jnp.int32)
        lo = linalg.apply_rotation_t(R, rel)
        ld = linalg.apply_rotation_t(R, d)
        p_loc = lo + t_safe[:, None] * ld
        n_local = geometry.primitive_normal(p_loc, scale, otype)
        n_world = linalg.apply_rotation(R, n_local)
        p_local = p_loc / scale

    fields = HitFields(
        color=rows[:, H_CR : H_CB + 1],
        refractive_index=rows[:, H_RI],
        refractivity=rows[:, H_REFR],
        reflectivity=rows[:, H_REFL],
        scatter_refract=rows[:, H_SCRFR],
        scatter_reflect=rows[:, H_SCRFL],
        texture_index=rows[:, H_TEX].astype(jnp.int32),
        emissive=rows[:, H_EMIS] > 0.5,
    )
    obj_orig = rows[:, H_OBJ].astype(jnp.int32)  # identity unless grouped
    h = Hit(t=t_safe, obj=obj_orig, hit=hit, normal=n_world, local_pos=p_local)
    return h, fields


def intersect_pallas(accel: PallasAccel, scene: Scene, o, d, time_ratio, t_limit) -> Hit:
    """Same Hit contract as ``intersect_brute``."""
    return intersect_pallas_full(accel, scene, o, d, time_ratio, t_limit)[0]


def intersect_pallas_fused(accel: PallasAccel, scene: Scene, o, d, time_ratio, t_limit):
    """(Hit, HitFields, surrounding_ri) — one fused kernel in sphere mode,
    separate sweeps otherwise."""
    if accel.mode != "spheres":
        hit, flds = intersect_pallas_full(accel, scene, o, d, time_ratio, t_limit)
        hp = o + hit.t[:, None] * d
        ri = surrounding_ri_pallas(accel, scene, hp + 1e-3 * hit.normal, time_ratio)
        return hit, flds, ri

    t, obj, ri = _sweep_dispatch(accel, o, d, time_ratio, t_limit, with_ri=True)
    hit, flds = _finish_hit(accel, o, d, time_ratio, t, obj)
    return hit, flds, ri


def occluded_nearest_obj_pallas(accel: PallasAccel, scene: Scene, o, d, time_ratio, t_limit):
    _, obj, _ = _sweep_dispatch(accel, o, d, time_ratio, t_limit, with_ri=False)
    if accel.perm is not None:
        obj = jnp.where(obj >= 0, accel.perm[jnp.maximum(obj, 0)], -1)
    return obj


def surrounding_ri_pallas(accel: PallasAccel, scene: Scene, point, time_ratio):
    return sweep_ri(accel.table, accel.mode, point, time_ratio)
