"""Generic-mode (rotated ellipsoid/cuboid) grouped sweep for the persistent
megakernel.

``kernels/sweep2.py`` is the sphere-mode fast path: its MXU-formulated
quadratic and the packed-key reduction assume isotropic spheres.  This
module brings the SAME grouped block-culling architecture to the generic
21-field primitive test (the reference flagship traversal's ``IntersectRay``
— ``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:212-266``: inverse
rotation into the local frame, then ellipsoid quadratic or cuboid slab by
object type), so the persistent kernel (``kernels/uber.py``) can drain
rotated-cuboid scenes (the INW-01 R-grid family) with the same
zero-scatter, ~100%-occupancy schedule as the headline sphere scene:

  - OBJECTS live on the sublane axis in Morton-sorted groups of ``gr`` rows
    (huge objects isolated first, groups ordered near-to-far from the
    camera); per group the local-frame transform and both primitive tests
    run as (gr, 1) x (1, L) broadcast VPU ops (~120 ops per object-ray).
  - Group-level AABB culling identical to the sphere path (``_slab_hit``):
    world AABBs of rotated objects are conservative, one slab test per
    group skips whole blocks.
  - The winner's exact t and world normal are recomputed per-lane from the
    one-hot-gathered object row (``_winner_refine_g``) — the generic
    analogue of ``sweep2._winner_refine``.

Dielectric generic scenes are served too: ``_ri_probe_g`` runs the rotated
point-in-primitive containment sum (the surrounding-refractive-index
estimate) grouped and point-in-group-AABB-culled, and ``sweep2g_nearest``
exposes the occlusion-grade sweep standalone for the fast gradient path's
detached winner-finding (``diff/fastpath.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tests_tpu.core import geometry
from raytracing_tests_tpu.kernels.sweep2 import (
    BIG_T,
    OT_COLS,
    _slab_hit,
    pack_ftab_splits,
)
from raytracing_tests_tpu.scene.types import Scene

# Generic object-table (Np, 128) column indices.
GO_PX, GO_PY, GO_PZ = 0, 1, 2
GO_DPX, GO_DPY, GO_DPZ = 3, 4, 5
(
    GO_R00, GO_R01, GO_R02, GO_R10, GO_R11, GO_R12, GO_R20, GO_R21, GO_R22,
) = range(6, 15)
GO_SX, GO_SY, GO_SZ = 15, 16, 17
GO_TYPE, GO_VALID, GO_RI = 18, 19, 20

# Generic fields table: sweep2's FT_* material rows (0..18) + the winner
# geometry needed by the per-lane refine: rotation, scale, type.
GFT_R00 = 19  # .. GFT_R22 = 27 (row-major)
GFT_SX, GFT_SY, GFT_SZ = 28, 29, 30
GFT_TYPE = 31
GFT_ROWS = 32  # 4 f32 sublane tiles

_ELL = float(geometry.ELLIPSOID)


def pack_tables_g(scene: Scene, order, n_pad: int, valid_mask=None):
    """Morton-ordered scene -> (otab (Np, 128), ftab (GFT_ROWS, Np)).
    ``valid_mask`` (original-index space) additionally kills rows — used by
    the dielectric-only probe sub-table."""
    s = {f: getattr(scene, f)[order] for f in (
        "position", "rotation", "scale", "delta_position", "obj_type",
        "color", "refractive_index", "refractivity", "reflectivity",
        "scatter_refract", "scatter_reflect", "texture_index", "emissive",
        "valid",
    )}
    if valid_mask is not None:
        s["valid"] = s["valid"] & valid_mask[order]
    n = order.shape[0]
    c = s["position"]
    dp = s["delta_position"]
    R = s["rotation"]
    sc = s["scale"]
    valid = s["valid"]

    otab = jnp.zeros((n_pad, OT_COLS), jnp.float32)
    otab = otab.at[:n, GO_PX : GO_PZ + 1].set(c)
    otab = otab.at[:n, GO_DPX : GO_DPZ + 1].set(dp)
    otab = otab.at[:n, GO_R00 : GO_R22 + 1].set(R.reshape(n, 9))
    otab = otab.at[:n, GO_SX : GO_SZ + 1].set(sc)
    otab = otab.at[:n, GO_TYPE].set(s["obj_type"].astype(jnp.float32))
    otab = otab.at[:n, GO_VALID].set(valid.astype(jnp.float32))
    otab = otab.at[:n, GO_RI].set(s["refractive_index"])

    frows = [
        c[:, 0], c[:, 1], c[:, 2],
        jnp.zeros((n,), jnp.float32),  # FT_RINV unused in generic mode
        dp[:, 0], dp[:, 1], dp[:, 2],
        s["color"][:, 0], s["color"][:, 1], s["color"][:, 2],
        s["refractive_index"], s["refractivity"], s["reflectivity"],
        s["scatter_refract"], s["scatter_reflect"],
        s["texture_index"].astype(jnp.float32),
        s["emissive"].astype(jnp.float32),
        order.astype(jnp.float32),
        jnp.zeros((n,), jnp.float32),  # FT_R2 unused in generic mode
    ]
    frows += [R.reshape(n, 9)[:, i] for i in range(9)]
    frows += [sc[:, 0], sc[:, 1], sc[:, 2],
              s["obj_type"].astype(jnp.float32)]
    assert len(frows) == GFT_ROWS
    ftab = jnp.zeros((GFT_ROWS, n_pad), jnp.float32)
    ftab = ftab.at[:, :n].set(jnp.stack(frows))
    return otab, ftab


@jax.tree_util.register_pytree_node_class
class Accel2G:
    """Generic-mode accel: Morton-grouped 21-field tables + group AABBs.
    Like ``sweep2.Accel2``, ``otab``/``gaabb`` carry ``n_pgroups`` trailing
    dielectric-only probe groups; ``ftab3`` spans the main rows only."""

    def __init__(self, otab, ftab3, gaabb, perm, gr: int, has_motion: bool,
                 n_pgroups: int = 0):
        self.otab = otab  # (Np + Pp, 128)
        self.ftab3 = ftab3  # 3x (GFT_ROWS, Np) bf16 hi/mid/lo splits
        self.gaabb = gaabb  # (G + PG, 128) rows: lo3 hi3
        self.perm = perm
        self.gr = gr
        self.has_motion = has_motion
        self.n_pgroups = n_pgroups

    mode = "generic"

    def tree_flatten(self):
        return (self.otab, self.ftab3, self.gaabb, self.perm), (
            self.gr, self.has_motion, self.n_pgroups)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def make_accel2g(scene: Scene, gr: int = 64, has_motion: bool = True,
                 sort_origin=None, probe_rows=None) -> Accel2G:
    """Group policy identical to ``sweep2.make_accel2`` (Morton order, huge
    objects isolated into leading groups, groups sorted near-to-far from
    ``sort_origin``), built over the generic 21-field table."""
    from raytracing_tests_tpu.bvh.build import morton3d

    lo, hi = scene.world_aabbs()
    valid = scene.valid
    big = jnp.max(jnp.where(valid[:, None], hi, -jnp.inf), axis=0)
    lo_v = jnp.where(valid[:, None], lo, big)
    hi_v = jnp.where(valid[:, None], hi, big)
    slo = jnp.min(lo_v, axis=0)
    sext = jnp.maximum(jnp.max(hi_v, axis=0) - slo, 1e-12)
    codes = morton3d(((lo_v + hi_v) * 0.5 - slo) / sext)
    size = jnp.max(hi_v - lo_v, axis=-1) / jnp.max(sext)
    huge = (size > 0.5) & valid
    codes = jnp.where(valid, codes >> jnp.uint32(2), jnp.uint32(0x3FFFFFFF))
    key = jnp.where(huge, jnp.uint32(0), codes + jnp.uint32(1))
    order = jnp.argsort(key).astype(jnp.int32)

    n = scene.capacity
    n_pad = -(-n // gr) * gr

    INF = 3.0e38
    lo_s = jnp.where(valid[order][:, None], lo[order], INF)
    hi_s = jnp.where(valid[order][:, None], hi[order], -INF)
    if n_pad != n:
        lo_s = jnp.concatenate([lo_s, jnp.full((n_pad - n, 3), INF)])
        hi_s = jnp.concatenate([hi_s, jnp.full((n_pad - n, 3), -INF)])
    glo = jnp.min(lo_s.reshape(-1, gr, 3), axis=1)
    ghi = jnp.max(hi_s.reshape(-1, gr, 3), axis=1)
    G = glo.shape[0]
    gaabb = jnp.zeros((G, OT_COLS), jnp.float32)
    gaabb = gaabb.at[:, 0:3].set(glo).at[:, 3:6].set(ghi)

    otab, ftab = pack_tables_g(scene, order, n_pad)

    perm = order
    if n_pad != n:
        perm = jnp.concatenate([perm, jnp.zeros((n_pad - n,), jnp.int32)])
    if sort_origin is not None:
        origin = jnp.asarray(sort_origin, jnp.float32)
        near = jnp.clip(origin, glo, ghi)
        d2 = jnp.sum((near - origin) ** 2, axis=1)
        gorder = jnp.argsort(d2)
        otab = otab.reshape(G, gr, OT_COLS)[gorder].reshape(n_pad, OT_COLS)
        ftab = ftab.reshape(GFT_ROWS, G, gr)[:, gorder].reshape(
            GFT_ROWS, n_pad)
        gaabb = gaabb[gorder]
        perm = perm.reshape(G, gr)[gorder].reshape(n_pad)

    from raytracing_tests_tpu.kernels.sweep2 import _probe_tables

    def _pack_probe(o, npd, anc, vm, dm):
        tab = pack_tables_g(scene, o, npd, vm)[0]
        return tab.at[:, GO_VALID].set(
            jnp.where(dm, tab[:, GO_VALID], 0.0))

    potab, pgaabb = _probe_tables(
        scene, key, valid, lo, hi, gr, probe_rows, _pack_probe)
    otab = jnp.concatenate([otab, potab])
    gaabb = jnp.concatenate([gaabb, pgaabb])
    return Accel2G(otab, pack_ftab_splits(ftab), gaabb, perm, gr, has_motion,
                   n_pgroups=pgaabb.shape[0])


def _local_frame(otab_ref, sl, ox, oy, oz, dx, dy, dz, omt, has_motion):
    """Shift rays object-relative and rotate into each object's local frame:
    (gr, 1) columns against (1, L) planes -> (gr, L) local origin/dir."""
    rx = ox - otab_ref[sl, GO_PX : GO_PX + 1]
    ry = oy - otab_ref[sl, GO_PY : GO_PY + 1]
    rz = oz - otab_ref[sl, GO_PZ : GO_PZ + 1]
    if has_motion:
        rx = rx + omt * otab_ref[sl, GO_DPX : GO_DPX + 1]
        ry = ry + omt * otab_ref[sl, GO_DPY : GO_DPY + 1]
        rz = rz + omt * otab_ref[sl, GO_DPZ : GO_DPZ + 1]
    r00 = otab_ref[sl, GO_R00 : GO_R00 + 1]
    r01 = otab_ref[sl, GO_R01 : GO_R01 + 1]
    r02 = otab_ref[sl, GO_R02 : GO_R02 + 1]
    r10 = otab_ref[sl, GO_R10 : GO_R10 + 1]
    r11 = otab_ref[sl, GO_R11 : GO_R11 + 1]
    r12 = otab_ref[sl, GO_R12 : GO_R12 + 1]
    r20 = otab_ref[sl, GO_R20 : GO_R20 + 1]
    r21 = otab_ref[sl, GO_R21 : GO_R21 + 1]
    r22 = otab_ref[sl, GO_R22 : GO_R22 + 1]
    # local = R^T @ rel (column dots), intersect_brute semantics.
    lox = r00 * rx + r10 * ry + r20 * rz
    loy = r01 * rx + r11 * ry + r21 * rz
    loz = r02 * rx + r12 * ry + r22 * rz
    ldx = r00 * dx + r10 * dy + r20 * dz
    ldy = r01 * dx + r11 * dy + r21 * dz
    ldz = r02 * dx + r12 * dy + r22 * dz
    return lox, loy, loz, ldx, ldy, ldz


def _both_t(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz):
    """Ellipsoid and cuboid candidate t on (gr, L) tiles (exact
    ``intersect_brute`` per-object semantics; dead rays with d = 0 produce
    a = 0 -> rejected).

    DIVISION, not multiply-by-reciprocal: the queue renderer's v1 kernel
    divides by scale, and the last-ulp difference between ``x / s`` and
    ``x * (1/s)`` flips binary outcomes downstream (shadow visibility) —
    parity requires bitwise-identical candidate t.  Zero-scale padding rows
    produce NaN here; every consumer select-guards on validity, exactly
    like the v1 kernel."""
    # Ellipsoid quadratic in /scale space.
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

    # Cuboid slab test (safe-inverse convention of geometry.ray_cuboid_t).
    eps = 1e-12

    def axis(lo, ld, s):
        ld_safe = jnp.where(jnp.abs(ld) < eps,
                            jnp.where(ld >= 0.0, eps, -eps), ld)
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
    return t_e, t_c


def _sweep_loop_g(otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz, omt, live,
                  tlim, t_sc, obj_sc, *, n_groups, gr, has_motion,
                  cnt_ref=None):
    """Grouped nearest-hit sweep over the generic table, writing best
    (t, obj) into the scratch refs.  Structure mirrors
    ``sweep2._sweep_loop`` (slab-culled groups, live-mask block skip); the
    reduction is the unpacked min+argmin (generic scenes commonly exceed
    the packed key's 1023-id limit)."""
    L = ox.shape[1]
    eps = 1e-12
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)

    t_sc[:] = jnp.minimum(jnp.full((1, L), BIG_T, jnp.float32), tlim)
    obj_sc[:] = jnp.full((1, L), -1, jnp.int32)

    for g in range(n_groups):
        ghit = _slab_hit(gaabb_ref, g, ox, oy, oz, ix, iy, iz, t_sc[:]) & live

        @pl.when(jnp.any(ghit))
        def _(g=g):
            if cnt_ref is not None:  # groups-entered diagnostic
                cnt_ref[3:4] = cnt_ref[3:4] + 1
            sl = slice(g * gr, (g + 1) * gr)
            lox, loy, loz, ldx, ldy, ldz = _local_frame(
                otab_ref, sl, ox, oy, oz, dx, dy, dz, omt, has_motion)
            t_e, t_c = _both_t(
                lox, loy, loz, ldx, ldy, ldz,
                otab_ref[sl, GO_SX : GO_SX + 1],
                otab_ref[sl, GO_SY : GO_SY + 1],
                otab_ref[sl, GO_SZ : GO_SZ + 1])
            typ = otab_ref[sl, GO_TYPE : GO_TYPE + 1]
            tc = jnp.where(typ == _ELL, t_e, t_c)
            tc = jnp.where(otab_ref[sl, GO_VALID : GO_VALID + 1] > 0.0,
                           tc, BIG_T)
            rid = g * gr + jax.lax.broadcasted_iota(jnp.int32, (gr, L), 0)
            gmin = jnp.min(tc, axis=0, keepdims=True)
            gobj = jnp.min(
                jnp.where(tc == gmin, rid, jnp.int32(0x7FFFFFFF)),
                axis=0, keepdims=True)
            better = gmin < t_sc[:]
            t_sc[:] = jnp.where(better, gmin, t_sc[:])
            obj_sc[:] = jnp.where(better, gobj, obj_sc[:])


def _sweep2g_nearest_kernel(n_groups: int, gr: int, has_motion: bool):
    def kernel(otab_ref, gaabb_ref, rays_ref, t_out, obj_out, t_sc, obj_sc):
        rays = rays_ref[:]
        ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
        dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
        live = (dx * dx + dy * dy + dz * dz) > 0.5
        _sweep_loop_g(otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz,
                      rays[6:7], live, rays[7:8], t_sc, obj_sc,
                      n_groups=n_groups, gr=gr, has_motion=has_motion)
        t_out[:] = t_sc[:]
        obj_out[:] = obj_sc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("gr", "has_motion", "block",
                                              "n_pgroups"))
def _sweep2g(otab, gaabb, rays, gr: int, has_motion: bool, block: int,
             n_pgroups: int = 0):
    from raytracing_tests_tpu.kernels.sweep2 import _interpret

    n_groups = otab.shape[0] // gr - n_pgroups  # main groups only
    Bp = rays.shape[1]
    lane = lambda rows: pl.BlockSpec((rows, block), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sweep2g_nearest_kernel(n_groups, gr, has_motion),
        grid=(Bp // block,),
        in_specs=[full(otab), full(gaabb), lane(8)],
        out_specs=(lane(1), lane(1)),
        out_shape=(jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, block), jnp.float32),
                        pltpu.VMEM((1, block), jnp.int32)],
        interpret=_interpret(),
    )(otab, gaabb, rays)


def sweep2g_nearest(accel: "Accel2G", o, d, time_ratio, t_limit,
                    block: int = 2048):
    """(t, obj_sorted) nearest-hit sweep over the generic table
    (occlusion-grade, no fields) — the generic analogue of
    ``sweep2.sweep2_nearest``."""
    from raytracing_tests_tpu.kernels.sweep2 import pack_rays

    rays, B = pack_rays(o, d, time_ratio, t_limit, block)
    t, obj = _sweep2g(accel.otab, accel.gaabb, rays, accel.gr,
                      accel.has_motion, block,
                      n_pgroups=getattr(accel, "n_pgroups", 0))
    return t[0, :B], obj[0, :B]


def _ri_probe_g(otab_ref, gaabb_ref, qx, qy, qz, omt, *, n_groups, gr,
                has_motion, need=None, g0=0):
    """Surrounding-RI containment sum at probe point q, generic mode: the
    rotated point-in-primitive test (local = R^T(q - c + omt*dp) / s;
    ellipsoid |local|^2 <= 1, cuboid all |local| <= 0.5 — division like
    the v1 RI kernel, sweep.py:_ri_kernel generic branch).  Groups whose
    AABB contains no needed probe point are skipped, the same culling as
    ``sweep2._ri_probe``."""

    L = qx.shape[1]

    def body(acc_sc, cnt_sc):
        acc_sc[:] = jnp.zeros((1, L), jnp.float32)
        cnt_sc[:] = jnp.zeros((1, L), jnp.float32)
        for g in range(g0, g0 + n_groups):
            pin = ((qx >= gaabb_ref[g, 0]) & (qx <= gaabb_ref[g, 3])
                   & (qy >= gaabb_ref[g, 1]) & (qy <= gaabb_ref[g, 4])
                   & (qz >= gaabb_ref[g, 2]) & (qz <= gaabb_ref[g, 5]))
            if need is not None:
                pin = pin & need

            @pl.when(jnp.any(pin))
            def _(g=g):
                sl = slice(g * gr, (g + 1) * gr)
                lox, loy, loz, _, _, _ = _local_frame(
                    otab_ref, sl, qx, qy, qz,
                    jnp.zeros((1, L), jnp.float32),
                    jnp.zeros((1, L), jnp.float32),
                    jnp.zeros((1, L), jnp.float32), omt, has_motion)
                sx = otab_ref[sl, GO_SX : GO_SX + 1]
                sy = otab_ref[sl, GO_SY : GO_SY + 1]
                sz = otab_ref[sl, GO_SZ : GO_SZ + 1]
                ex, ey, ez = lox / sx, loy / sy, loz / sz
                in_e = ex * ex + ey * ey + ez * ez <= 1.0
                in_c = ((jnp.abs(ex) <= 0.5) & (jnp.abs(ey) <= 0.5)
                        & (jnp.abs(ez) <= 0.5))
                typ = otab_ref[sl, GO_TYPE : GO_TYPE + 1]
                inside = (jnp.where(typ == _ELL, in_e,
                                    (typ == float(geometry.CUBOID)) & in_c)
                          & (otab_ref[sl, GO_VALID : GO_VALID + 1] > 0.0))
                ri_col = otab_ref[sl, GO_RI : GO_RI + 1]
                acc_sc[:] = acc_sc[:] + jnp.sum(
                    jnp.where(inside, ri_col, 0.0), axis=0, keepdims=True)
                cnt_sc[:] = cnt_sc[:] + jnp.sum(
                    inside.astype(jnp.float32), axis=0, keepdims=True)
        return acc_sc[:], cnt_sc[:]

    acc, cnt = pl.run_scoped(
        body,
        acc_sc=pltpu.VMEM((1, L), jnp.float32),
        cnt_sc=pltpu.VMEM((1, L), jnp.float32),
    )
    return jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)


def _winner_refine_g(rows, ox, oy, oz, dx, dy, dz, omt, t_best, hit,
                     has_motion):
    """Per-lane exact re-intersection of the winning generic object from
    its gathered row: local-frame transform, type-selected primitive test,
    and the world-space hit normal (rotated ``geometry.primitive_normal``).
    Returns (t_best, t_safe, px, py, pz, nx, ny, nz) — the contract of
    ``sweep2._winner_refine``."""
    from raytracing_tests_tpu.kernels.sweep2 import (
        FT_CX, FT_CY, FT_CZ, FT_DPX, FT_DPY, FT_DPZ)

    cex = rows[FT_CX : FT_CX + 1]
    cey = rows[FT_CY : FT_CY + 1]
    cez = rows[FT_CZ : FT_CZ + 1]
    if has_motion:
        cex = cex - omt * rows[FT_DPX : FT_DPX + 1]
        cey = cey - omt * rows[FT_DPY : FT_DPY + 1]
        cez = cez - omt * rows[FT_DPZ : FT_DPZ + 1]
    rex = ox - cex
    rey = oy - cey
    rez = oz - cez
    r = [rows[GFT_R00 + i : GFT_R00 + i + 1] for i in range(9)]
    lox = r[0] * rex + r[3] * rey + r[6] * rez
    loy = r[1] * rex + r[4] * rey + r[7] * rez
    loz = r[2] * rex + r[5] * rey + r[8] * rez
    ldx = r[0] * dx + r[3] * dy + r[6] * dz
    ldy = r[1] * dx + r[4] * dy + r[7] * dz
    ldz = r[2] * dx + r[5] * dy + r[8] * dz
    sx = rows[GFT_SX : GFT_SX + 1]
    sy = rows[GFT_SY : GFT_SY + 1]
    sz = rows[GFT_SZ : GFT_SZ + 1]
    t_e, t_c = _both_t(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz)
    is_ell = rows[GFT_TYPE : GFT_TYPE + 1] == _ELL
    t_ref = jnp.where(is_ell, t_e, t_c)
    ok = hit & (t_ref < BIG_T)
    t_best = jnp.where(ok, t_ref, t_best)
    t_safe = jnp.where(hit, t_best, 1.0)

    # Local hit point; normals per geometry.{ellipsoid,cuboid}_normal,
    # in the oracle's exact arithmetic (division + sqrt-normalize).
    plx = lox + t_safe * ldx
    ply = loy + t_safe * ldy
    plz = loz + t_safe * ldz
    gx = plx / (sx * sx)
    gy = ply / (sy * sy)
    gz = plz / (sz * sz)
    gn = jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-38))
    enx, eny, enz = gx / gn, gy / gn, gz / gn
    # Cuboid: axis of the nearest face, scan order +x,-x,+y,-y,+z,-z with
    # strict first-minimum (reference tie-break).
    d0 = jnp.abs(plx - 0.5 * sx)
    d1 = jnp.abs(plx + 0.5 * sx)
    d2 = jnp.abs(ply - 0.5 * sy)
    d3 = jnp.abs(ply + 0.5 * sy)
    d4 = jnp.abs(plz - 0.5 * sz)
    d5 = jnp.abs(plz + 0.5 * sz)
    best = d0
    cnx = jnp.ones_like(plx)
    cny = jnp.zeros_like(plx)
    cnz = jnp.zeros_like(plx)
    for dist, (vx, vy, vz) in (
        (d1, (-1.0, 0.0, 0.0)), (d2, (0.0, 1.0, 0.0)),
        (d3, (0.0, -1.0, 0.0)), (d4, (0.0, 0.0, 1.0)),
        (d5, (0.0, 0.0, -1.0)),
    ):
        upd = dist < best
        best = jnp.where(upd, dist, best)
        cnx = jnp.where(upd, vx, cnx)
        cny = jnp.where(upd, vy, cny)
        cnz = jnp.where(upd, vz, cnz)
    nlx = jnp.where(is_ell, enx, cnx)
    nly = jnp.where(is_ell, eny, cny)
    nlz = jnp.where(is_ell, enz, cnz)
    # World normal = R @ n_local (row combinations).
    nx = r[0] * nlx + r[1] * nly + r[2] * nlz
    ny = r[3] * nlx + r[4] * nly + r[5] * nlz
    nz = r[6] * nlx + r[7] * nly + r[8] * nlz

    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz
    return t_best, t_safe, px, py, pz, nx, ny, nz
