"""Forward megakernel: sweep + winner gather + surrounding-RI + SHADING in
one Pallas kernel.

The round-1 pipeline ran the Pallas sweep, then XLA did the material gather
(16 ms/frame), the shading elementwise soup (19 ms), and the queue plumbing
— every stage re-streaming (B, ...) arrays through HBM.  This kernel is the
TPU shape of the reference's GLSL megakernel
(``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:415-594``): one pass per
ray batch computes the nearest hit, the winner's material row (one-hot MXU
matmul), the surrounding refractive index, the INW shading model, and the
two spawned children — everything VMEM-resident.

Scope (asserted by the caller): sphere-mode scenes, 'bvh' shading, no
emissive lights, no textures — exactly the headline benchmark family.  The
general renderer (``ops.render``) remains the fully-featured path.

Pool record layout (16 rows x lanes, f32) shared with ``ops.megalanes`` and
``kernels.uber``: rows 0-2 origin, 3-5 direction, 6 omt (1 - time_ratio),
7 t_limit, 8 contribution, 9 bounced, 10-15 spare (two f32 sublane tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tests_tpu.kernels.sweep2 import (
    BIG_T,
    DEFAULT_L,
    FT_CR, FT_CG, FT_CB, FT_MRI, FT_REFR, FT_REFL, FT_SRFR, FT_SRFL,
    FT_EMIS,
    _gather_rows,
    _interpret,
    _ri_probe,
    _sweep_loop,
    _winner_refine,
)

P_OX, P_OY, P_OZ, P_DX, P_DY, P_DZ, P_OMT, P_TLIM, P_CONTRIB, P_BOUNCED = range(10)
POOL_ROWS = 16

GOLDEN_ANGLE = np.pi * (3.0 - np.sqrt(5.0))


def _cross_up(dx, dy, dz):
    """cross(d, (0,1,0)) and cross(that, d) on (1, L) planes."""
    rx, ry, rz = -dz, jnp.zeros_like(dy), dx
    ux = ry * dz - rz * dy
    uy = rz * dx - rx * dz
    uz = rx * dy - ry * dx
    return rx, ry, rz, ux, uy, uz


def _deviate(dx, dy, dz, sidx, spp: int, tan_theta, trig=None):
    """``sampling.deviate_within_cone`` on planes: sunflower offset in the
    plane of cross(d, up) x cross(., d), scaled by the reference's 0.1.

    ``trig``: optional carried (cos th, sin th) planes for th =
    GOLDEN_ANGLE * sidx — the SAME angle every sunflower/fibonacci user
    needs, and ``sidx`` is constant for a lane's whole round, so the
    persistent kernel computes the pair once at ray regeneration (Mosaic
    lowers vector sin/cos expensively: carrying them measured ~8 us/iter
    on low-spp configs)."""
    n = float(spp)
    b = float(np.round(2.0 * np.sqrt(n)))
    denom = n - (b + 1.0) / 2.0
    denom = denom if denom > 0 else 1.0
    half = tan_theta  # aperture = 2*tan_theta -> half = tan_theta
    r = jnp.where(
        sidx > n - b, half, half * jnp.sqrt(jnp.maximum(sidx - 0.5, 0.0) / denom)
    )
    r = jnp.where(sidx == 0.0, 0.0, r)
    if trig is None:
        th = GOLDEN_ANGLE * sidx
        trig = (jnp.cos(th), jnp.sin(th))
    offx = r * trig[0]
    offy = r * trig[1]
    rx, ry, rz, ux, uy, uz = _cross_up(dx, dy, dz)
    vx = dx + 0.1 * (offx * rx + offy * ux)
    vy = dy + 0.1 * (offx * ry + offy * uy)
    vz = dz + 0.1 * (offx * rz + offy * uz)
    inv = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-38))
    return vx * inv, vy * inv, vz * inv


def trace_shade_block(otab_ref, ftab_ref, gaabb_ref,
                      ox, oy, oz, dx, dy, dz, omt, tlim, contrib, bounced,
                      active, sidx, t_sc, obj_sc, *, n_pad, n_groups, gr,
                      has_motion, has_dielectrics, spp, max_bounces, t_max,
                      bg_bottom, bg_top, use_mxu, n_pgroups=0, tex=None):
    """Sweep + gather + refine + surrounding-RI + INW shading + child-ray
    construction for one lane block — the whole per-ray pipeline on (1, L)
    planes.  Shared by the chunked megakernel and the persistent kernel.

    Returns (add_r, add_g, add_b, hit_t, refr16, refl16, spawn_refr,
    spawn_refl); children are (16, L) pool-layout records, gated by the
    spawn masks."""
    L = ox.shape[1]
    a = dx * dx + dy * dy + dz * dz
    live = (a > 0.5) & active

    _sweep_loop(otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz, omt,
                live, tlim, t_sc, obj_sc, None, None, n_groups=n_groups,
                gr=gr, has_motion=has_motion, use_mxu=use_mxu,
                with_edge=False)
    t_best = t_sc[:]
    obj_best = obj_sc[:]
    hit = (obj_best >= 0) & active

    # Background gradient (01_BVH glsl:521-540).
    tt = (dy + 1.0) * 0.5
    bgr = (1.0 - tt) * bg_bottom[0] + tt * bg_top[0]
    bgg = (1.0 - tt) * bg_bottom[1] + tt * bg_top[1]
    bgb = (1.0 - tt) * bg_bottom[2] + tt * bg_top[2]

    # (An all-miss fast branch via in-kernel lax.cond does not survive this
    # Mosaic toolchain — the unconditional path it is.)
    return _shade_hits(
        otab_ref, ftab_ref, gaabb_ref,
        ox, oy, oz, dx, dy, dz, omt, contrib, bounced, active, sidx,
        t_best, obj_best, hit, bgr, bgg, bgb, n_pad=n_pad,
        n_groups=n_groups, gr=gr, has_motion=has_motion,
        has_dielectrics=has_dielectrics, spp=spp,
        max_bounces=max_bounces, t_max=t_max, use_mxu=use_mxu,
        n_pgroups=n_pgroups, tex=tex)


def _gather_refine(ftab_ref, obj_best, ox, oy, oz,
                   dx, dy, dz, omt, t_best, hit, *, n_pad, has_motion,
                   mode):
    """One-hot winner gather + mode-dispatched exact re-intersection.
    Returns (rows, (t_best, t_safe, px, py, pz, nx, ny, nz, lpx, lpy, lpz))
    — the shared prelude of every shading model.  (lpx, lpy, lpz) is the
    unit-space hit position for cube-sphere texturing; for isotropic
    spheres it IS the unit normal (``Hit.local_pos`` convention)."""
    L = ox.shape[1]
    rows = _gather_rows(ftab_ref, obj_best, n_pad, L)
    if mode == "spheres":
        refined = _winner_refine(rows, ox, oy, oz, dx, dy, dz, omt,
                                 t_best, hit, has_motion)
        refined = refined + refined[5:8]  # local_pos == normal
    else:
        from raytracing_tests_tpu.kernels.sweep2g import _winner_refine_g

        refined = _winner_refine_g(rows, ox, oy, oz, dx, dy, dz, omt,
                                   t_best, hit, has_motion)
    return rows, refined


def _texture_color(rows, lpx, lpy, lpz, did_hit, tex):
    """Albedo rows, cube-sphere-atlas-modulated where the winner carries a
    texture index (the in-kernel shape of ``ops.render._material_color``,
    03_Texturing glsl:353-414).  ``tex`` = (thi_ref, tmid_ref, tlo_ref,
    (T, H, W6, THp, W6p)) or None.  The sampler is gated on any lane
    needing it — untextured blocks pay two compares."""
    cr = rows[FT_CR : FT_CR + 1]
    cg = rows[FT_CG : FT_CG + 1]
    cb = rows[FT_CB : FT_CB + 1]
    if tex is None:
        return cr, cg, cb
    from raytracing_tests_tpu.kernels.sweep2 import FT_TEX
    from raytracing_tests_tpu.kernels.texture import sample_atlas_k

    thi_ref, tmid_ref, tlo_ref, (T, H, W6, THp, W6p) = tex
    ti = rows[FT_TEX : FT_TEX + 1]
    # round() like _rows_to_hit: the gather carries ~1e-4 absolute error.
    ti = jnp.floor(ti + 0.5)
    need = did_hit & (ti > 0.5)
    L = ti.shape[1]

    def body(tc_sc):
        tc_sc[:] = jnp.ones((3, L), jnp.float32)

        @pl.when(jnp.any(need))
        def _():
            tr, tg, tb = sample_atlas_k(
                thi_ref, tmid_ref, tlo_ref, ti, lpx, lpy, lpz,
                T=T, H=H, W6=W6, THp=THp, W6p=W6p)
            tc_sc[:] = jnp.concatenate([tr, tg, tb], axis=0)

        return tc_sc[:]

    tc = pl.run_scoped(body, tc_sc=pltpu.VMEM((3, L), jnp.float32))
    cr = jnp.where(need, cr * tc[0:1], cr)
    cg = jnp.where(need, cg * tc[1:2], cg)
    cb = jnp.where(need, cb * tc[2:3], cb)
    return cr, cg, cb


def _norm3(x, y, z, eps):
    """linalg.normalize on (1, L) planes: v / sqrt(max(|v|^2, eps))."""
    n = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, max(eps, 1e-38)))
    return x / n, y / n, z / n


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _fibonacci_hemisphere_k(sidx, spp, s, fx, fy, fz, trig=None):
    """``sampling.fibonacci_hemisphere`` on (1, L) planes: deterministic
    scatter around the focus direction on a scaled fibonacci sphere.
    ``trig``: carried (cos, sin) of GOLDEN_ANGLE * sidx (see ``_deviate``)."""
    n = float(spp)
    y = 1.0 - sidx / max(n - 1.0, 1.0)
    radius = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    if trig is None:
        theta = GOLDEN_ANGLE * sidx
        trig = (jnp.cos(theta), jnp.sin(theta))
    x = trig[0] * radius
    z = trig[1] * radius
    x, y, z = x * s, y * s, z * s
    # z_cap = normalize(cross(up, f)) with up = (0,1,0) -> (fz, 0, -fx)
    zcx, zcy, zcz = _norm3(fz, jnp.zeros_like(fz), -fx, 1e-20)
    xc = _cross3(fx, fy, fz, zcx, zcy, zcz)
    xcx, xcy, xcz = _norm3(*xc, 1e-20)
    px = fx + x * xcx + y * fx + z * zcx
    py = fy + x * xcy + y * fy + z * zcy
    pz = fz + x * xcz + y * fz + z * zcz
    return _norm3(px, py, pz, 1e-38)


def _shade_materials_k(rows, t_best, t_safe, px, py, pz, nx, ny, nz,
                       lpx, lpy, lpz, dx, dy, dz, omt, contrib, bounced,
                       active, sidx, medium, parent_medium, hit, bgr, bgg,
                       bgb, *, spp, max_bounces, t_max, tex=None, trig=None):
    """``ops.render._shade_materials`` on (1, L) planes — the IOW-03
    Shirley-materials spawn model (03_Shadows_and_Materials glsl:291-353):
    per-ray medium RI (depth-2 stack carried in the pool record), Schlick
    contribution shift, fibonacci-hemisphere scatter, TIR -> reflection,
    contribution^2 * albedo local term, no 0.5-forward damping.

    Returns the ``_shade_hits`` contract: (add_r, add_g, add_b, hit_t,
    refr16, refl16, spawn_refr, spawn_refl, white); children carry
    (medium, parent_medium) in record rows 10-11."""
    L = px.shape[1]
    missed = active & ~hit
    miss_c = jnp.where(missed, contrib, 0.0)
    add_r = miss_c * bgr
    add_g = miss_c * bgg
    add_b = miss_c * bgb

    mat_ri = rows[FT_MRI : FT_MRI + 1]
    refrv = rows[FT_REFR : FT_REFR + 1]
    reflv = rows[FT_REFL : FT_REFL + 1]
    srfr = rows[FT_SRFR : FT_SRFR + 1]
    srfl = rows[FT_SRFL : FT_SRFL + 1]

    cos_theta = nx * dx + ny * dy + nz * dz
    inner = cos_theta > 0.0
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    target = jnp.where(inner, parent_medium, mat_ri)
    ratio = medium / jnp.maximum(target, 1e-6)
    ratio_sin = ratio * sin_theta
    tir = ratio_sin > 1.0

    refr_c = refrv
    # Schlick shift from refraction to reflection on outer hits
    # (glsl:326-333; linalg.schlick formula).
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    cosc = jnp.clip(-cos_theta, 0.0, 1.0)
    om = 1.0 - cosc
    schl = r0 + (1.0 - r0) * om * om * om * om * om
    shift = jnp.where(~inner, refr_c * schl, 0.0)
    refr_c = refr_c - shift
    refl_c = reflv + shift
    refl_c = jnp.where(tir, 1.0, jnp.where(inner, 0.0, refl_c))

    # Grazing-reflection lift (LaunchRay glsl:230-247).
    _nx = jnp.where(inner, -nx, nx)
    _ny = jnp.where(inner, -ny, ny)
    _nz = jnp.where(inner, -nz, nz)
    rmx = dx - 2.0 * cos_theta * nx
    rmy = dy - 2.0 * cos_theta * ny
    rmz = dz - 2.0 * cos_theta * nz
    n2ir = _norm3(*_cross3(_nx, _ny, _nz, dx, dy, dz), 1e-20)
    n2n = _norm3(*_cross3(*n2ir, _nx, _ny, _nz), 1e-20)
    s = jnp.where(inner, srfr, srfl)
    inv = 1.0 / jnp.sqrt(1.0 + s * s)
    mrx = s * inv * _nx + inv * n2n[0]
    mry = s * inv * _ny + inv * n2n[1]
    mrz = s * inv * _nz + inv * n2n[2]
    lift = ((rmx * _nx + rmy * _ny + rmz * _nz)
            <= (mrx * _nx + mry * _ny + mrz * _nz))
    use_lift = lift & ~inner
    rbx = jnp.where(use_lift, mrx, rmx)
    rby = jnp.where(use_lift, mry, rmy)
    rbz = jnp.where(use_lift, mrz, rmz)
    rdx, rdy, rdz = _fibonacci_hemisphere_k(sidx, spp, srfl, rbx, rby, rbz,
                                            trig=trig)
    tin = tir & inner
    rdx = jnp.where(tin, rbx, rdx)
    rdy = jnp.where(tin, rby, rdy)
    rdz = jnp.where(tin, rbz, rdz)
    bounced1 = bounced + 1.0
    depth_ok = bounced1 < float(max_bounces)
    spawn_refl = (hit & depth_ok & (~inner | tir)
                  & (contrib * refl_c > 0.0))

    # Refraction (glsl:336-345): note _n2 is the OPPOSITE of _normal.
    n2x = jnp.where(inner, nx, -nx)
    n2y = jnp.where(inner, ny, -ny)
    n2z = jnp.where(inner, nz, -nz)
    ycx = n2x * cos_theta
    ycy = n2y * cos_theta
    ycz = n2z * cos_theta
    xcx = dx - ycx
    xcy = dy - ycy
    xcz = dz - ycz
    sq = jnp.sqrt(jnp.maximum(1.0 - ratio_sin * ratio_sin, 0.0))
    frx = ratio_sin * n2x + sq * xcx
    fry = ratio_sin * n2y + sq * xcy
    frz = ratio_sin * n2z + sq * xcz
    fbx, fby, fbz = _norm3(frx, fry, frz, 1e-20)
    fdx, fdy, fdz = _fibonacci_hemisphere_k(sidx, spp, srfr, fbx, fby, fbz,
                                            trig=trig)
    spawn_refr = hit & depth_ok & ~tir & (contrib * refr_c > 0.0)

    # Local term: contribution^2 * albedo (glsl:250 + :304).
    mcr, mcg, mcb = _texture_color(rows, lpx, lpy, lpz, hit, tex)
    hit_c = jnp.where(hit, contrib * contrib, 0.0)
    add_r = add_r + hit_c * mcr
    add_g = add_g + hit_c * mcg
    add_b = add_b + hit_c * mcb
    hit_t = jnp.where(hit, t_best, t_max)

    tmax_row = jnp.full((1, L), t_max, jnp.float32)
    z4 = jnp.zeros((4, L), jnp.float32)
    refr16 = jnp.concatenate([
        px + 1e-4 * n2x, py + 1e-4 * n2y, pz + 1e-4 * n2z,
        fdx, fdy, fdz, omt, tmax_row, contrib * refr_c, bounced1,
        target, jnp.where(inner, jnp.ones((1, L), jnp.float32), medium), z4,
    ], axis=0)
    refl16 = jnp.concatenate([
        px - 1e-4 * n2x, py - 1e-4 * n2y, pz - 1e-4 * n2z,
        rdx, rdy, rdz, omt, tmax_row, contrib * refl_c, bounced1,
        medium, parent_medium, z4,
    ], axis=0)
    white = jnp.zeros((1, L), jnp.bool_)
    return (add_r, add_g, add_b, hit_t, refr16, refl16, spawn_refr,
            spawn_refl, white)


def _shadow_factor_k(otab_ref, gaabb_ref, ftab_ref, lights_ref,
                     px, py, pz, nx, ny, nz, omt, sidx, did_hit, *,
                     n_pad, n_groups, gr, has_motion, use_mxu, mode,
                     spp, n_lights, gkinds=None, n_sgroups=0, sg0=0):
    """In-kernel fraction of lights visible from the hit point — the
    persistent-kernel shape of ``ops.render._shadow_factor`` (lights
    glsl:604-660).  One occlusion sweep per light: the shadow ray aims at a
    per-sample jitter point inside the light's AABB, the t limit is
    center-distance + AABB diagonal, and the light counts as visible when
    the nearest occluder is ANY emissive object (checked via a one-row
    one-hot matmul against the emissive field — exact in bf16, 0/1 values).
    ``lights_ref`` is SMEM (n_lights, 8): bb_min xyz, bb_max xyz, diag."""
    import jax as _jax

    L = px.shape[1]
    sratio = sidx * (1.0 / spp)
    sox = px + 1e-4 * nx
    soy = py + 1e-4 * ny
    soz = pz + 1e-4 * nz

    def body(lit_sc, st_sc, so_sc):
        lit_sc[:] = jnp.zeros((1, L), jnp.float32)
        for l in range(n_lights):
            mnx, mny, mnz = (lights_ref[l, 0], lights_ref[l, 1],
                             lights_ref[l, 2])
            mxx, mxy, mxz = (lights_ref[l, 3], lights_ref[l, 4],
                             lights_ref[l, 5])
            diag = lights_ref[l, 6]
            tx = mnx + (mxx - mnx) * sratio
            ty = mny + (mxy - mny) * sratio
            tz = mnz + (mxz - mnz) * sratio
            ddx = tx - sox
            ddy = ty - soy
            ddz = tz - soz
            # Exact linalg.normalize semantics (v / sqrt, not rsqrt): the
            # last-ulp difference flips binary shadow visibility on grazing
            # rays, visibly diverging from the queue renderer.
            dnrm = jnp.sqrt(
                jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-38))
            ddx, ddy, ddz = ddx / dnrm, ddy / dnrm, ddz / dnrm
            # Dead/non-hit lanes carry d = 0 (live-mask block culling).
            ddx = jnp.where(did_hit, ddx, 0.0)
            ddy = jnp.where(did_hit, ddy, 0.0)
            ddz = jnp.where(did_hit, ddz, 0.0)
            cx = (mnx + mxx) * 0.5
            cy = (mny + mxy) * 0.5
            cz = (mnz + mxz) * 0.5
            ex = cx - sox
            ey = cy - soy
            ez = cz - soz
            tlim = jnp.sqrt(
                jnp.maximum(ex * ex + ey * ey + ez * ez, 0.0)) + diag
            if mode == "spheres":
                _sweep_loop(otab_ref, gaabb_ref, sox, soy, soz,
                            ddx, ddy, ddz, omt, did_hit, tlim, st_sc, so_sc,
                            None, None, n_groups=n_groups, gr=gr,
                            has_motion=has_motion, use_mxu=use_mxu,
                            with_edge=False)
            else:
                from raytracing_tests_tpu.kernels.sweep2g import _sweep_loop_g

                _sweep_loop_g(otab_ref, gaabb_ref, sox, soy, soz,
                              ddx, ddy, ddz, omt, did_hit, tlim, st_sc,
                              so_sc, n_groups=n_groups, gr=gr,
                              has_motion=has_motion, gkinds=gkinds,
                              n_sgroups=n_sgroups, sg0=sg0)
            obj_s = so_sc[:]
            rid_full = _jax.lax.broadcasted_iota(jnp.int32, (n_pad, L), 0)
            oh = (rid_full == obj_s).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            emis = _jax.lax.dot_general(
                ftab_ref[FT_EMIS : FT_EMIS + 1], oh, dn,
                preferred_element_type=jnp.float32)
            vis = (obj_s >= 0) & (emis > 0.5)
            lit_sc[:] = lit_sc[:] + jnp.where(vis, 1.0, 0.0)
        return lit_sc[:]

    lit = pl.run_scoped(
        body,
        lit_sc=pltpu.VMEM((1, L), jnp.float32),
        st_sc=pltpu.VMEM((1, L), jnp.float32),
        so_sc=pltpu.VMEM((1, L), jnp.int32),
    )
    return lit * (1.0 / n_lights)


def _shade_hits(otab_ref, ftab_ref, gaabb_ref,
                ox, oy, oz, dx, dy, dz, omt, contrib, bounced, active, sidx,
                t_best, obj_best, hit, bgr, bgg, bgb, *, n_pad, n_groups, gr,
                has_motion, has_dielectrics, spp, max_bounces, t_max,
                use_mxu, mode: str = "spheres", lights_ref=None,
                n_lights: int = 0, n_pgroups: int = 0, tex=None,
                gkinds=None, n_sgroups: int = 0, trig=None):
    L = ox.shape[1]
    rows, (t_best, t_safe, px, py, pz, nx, ny, nz, lpx, lpy, lpz) = (
        _gather_refine(
            ftab_ref, obj_best, ox, oy, oz, dx, dy, dz,
            omt, t_best, hit, n_pad=n_pad, has_motion=has_motion, mode=mode))

    # Emissive abort ("paint it white", lights glsl:662-666): the sample
    # becomes pure white; the lane's remaining tree is dropped by the caller.
    white = jnp.zeros((1, L), jnp.bool_)
    if n_lights > 0:
        white = hit & (rows[FT_EMIS : FT_EMIS + 1] > 0.5)
    did_hit = hit & ~white
    missed = active & ~hit
    miss_c = jnp.where(missed, contrib, 0.0)
    add_r = miss_c * bgr
    add_g = miss_c * bgg
    add_b = miss_c * bgb

    if n_lights > 0:
        lit = _shadow_factor_k(
            otab_ref, gaabb_ref, ftab_ref, lights_ref, px, py, pz,
            nx, ny, nz, omt, sidx, did_hit, n_pad=n_pad,
            n_groups=n_groups, gr=gr, has_motion=has_motion,
            use_mxu=use_mxu, mode=mode, spp=spp, n_lights=n_lights,
            gkinds=gkinds, n_sgroups=n_sgroups,
            sg0=n_groups + n_pgroups)
        contrib = jnp.where(did_hit, contrib * lit, contrib)

    mat_ri = rows[FT_MRI : FT_MRI + 1]
    refrv = rows[FT_REFR : FT_REFR + 1]
    reflv = rows[FT_REFL : FT_REFL + 1]
    srfr = rows[FT_SRFR : FT_SRFR + 1]
    srfl = rows[FT_SRFL : FT_SRFL + 1]

    ndotd = nx * dx + ny * dy + nz * dz
    inner = ndotd > 0.0

    import os as _os
    _abl = frozenset(_os.environ.get("UBER_ABLATE", "").split(","))
    if has_dielectrics and n_pgroups > 0 and "probe" not in _abl:
        # Only dielectric winners / interior hits consume sur_ri; skipped
        # lanes read the neutral 1.0.  The probe loops over the trailing
        # dielectric-only sub-table: PROBE_GR-row groups at otab rows
        # [n_pad, ...), gaabb rows [n_groups, n_groups + n_pgroups).
        from raytracing_tests_tpu.kernels.sweep2 import PROBE_GR

        need = did_hit & (inner | (refrv > 0.002))
        if mode == "spheres":
            # use_mxu=True for the PROBE regardless of the sweep's choice:
            # the HIGHEST-precision (gr, 8) @ (8, L) center dot replaces 3
            # strided column reads + broadcast FMAs and measured 1.7 us/iter
            # faster same-window on the headline (identical results).
            sur_ri = _ri_probe(
                otab_ref, gaabb_ref, px + 1e-3 * nx, py + 1e-3 * ny,
                pz + 1e-3 * nz, omt, n_groups=n_pgroups, gr=PROBE_GR,
                has_motion=has_motion, use_mxu=True, need=need,
                g0=n_groups, row0=n_pad)
        else:
            from raytracing_tests_tpu.kernels.sweep2g import _ri_probe_g

            sur_ri = _ri_probe_g(
                otab_ref, gaabb_ref, px + 1e-3 * nx, py + 1e-3 * ny,
                pz + 1e-3 * nz, omt, n_groups=n_pgroups, gr=PROBE_GR,
                has_motion=has_motion, need=need, g0=n_groups, row0=n_pad)
    else:
        sur_ri = jnp.ones((1, L), jnp.float32)

    bounced1 = bounced + 1.0
    can_spawn = (((reflv > 0.002) | (refrv > 0.002)) & (contrib > 0.01)
                 & (bounced1 < float(max_bounces)) & did_hit)

    # Outer reflection: mirror + cone deviation (01_BVH glsl:556-566).
    rlx = dx - 2.0 * ndotd * nx
    rly = dy - 2.0 * ndotd * ny
    rlz = dz - 2.0 * ndotd * nz
    rinv = jax.lax.rsqrt(jnp.maximum(rlx * rlx + rly * rly + rlz * rlz,
                                     1e-38))
    rlx, rly, rlz = rlx * rinv, rly * rinv, rlz * rinv
    dvx, dvy, dvz = _deviate(rlx, rly, rlz, sidx, spp, srfl, trig=trig)
    use_dev = srfl > 0.001
    rlx = jnp.where(use_dev, dvx, rlx)
    rly = jnp.where(use_dev, dvy, rly)
    rlz = jnp.where(use_dev, dvz, rlz)

    # Outer refraction (glsl:567-577): eta = sur/mat.
    eta_o = sur_ri / jnp.maximum(mat_ri, 1e-6)
    cos_i = -ndotd  # > 0 for outer hits
    k_o = 1.0 - eta_o * eta_o * (1.0 - cos_i * cos_i)
    sqk_o = jnp.sqrt(jnp.maximum(k_o, 0.0))
    rfx = eta_o * dx + (eta_o * cos_i - sqk_o) * nx
    rfy = eta_o * dy + (eta_o * cos_i - sqk_o) * ny
    rfz = eta_o * dz + (eta_o * cos_i - sqk_o) * nz
    finv = jax.lax.rsqrt(jnp.maximum(rfx * rfx + rfy * rfy + rfz * rfz,
                                     1e-38))
    rfx, rfy, rfz = rfx * finv, rfy * finv, rfz * finv
    fvx, fvy, fvz = _deviate(rfx, rfy, rfz, sidx, spp, srfr, trig=trig)
    use_fdev = (srfr > 0.001) & (k_o > 0.0)
    rfx = jnp.where(use_fdev, fvx, rfx)
    rfy = jnp.where(use_fdev, fvy, rfy)
    rfz = jnp.where(use_fdev, fvz, rfz)
    refr_ok_o = k_o > 0.0

    # Inner hit (glsl:578-585): flip normal, eta = mat/sur; TIR reflects.
    eta_i = mat_ri / jnp.maximum(sur_ri, 1e-6)
    cos_ii = ndotd  # = -(d . n_in), > 0 for inner hits
    k_i = 1.0 - eta_i * eta_i * (1.0 - cos_ii * cos_ii)
    sqk_i = jnp.sqrt(jnp.maximum(k_i, 0.0))
    ifx = eta_i * dx - (eta_i * cos_ii - sqk_i) * nx
    ify = eta_i * dy - (eta_i * cos_ii - sqk_i) * ny
    ifz = eta_i * dz - (eta_i * cos_ii - sqk_i) * nz
    tir = k_i <= 0.0
    refr_ok_i = ~tir

    # Select inner/outer children.  (Logical ops, not jnp.where on
    # bools: Mosaic lowers a bool select via an i8->i1 trunci it cannot
    # compile.)
    spawn_refr = can_spawn & ((inner & refr_ok_i)
                              | (~inner & refr_ok_o & (refrv > 0.002)))
    spawn_refl = can_spawn & ((inner & tir) | (~inner & (reflv > 0.002)))
    cdx = jnp.where(inner, ifx, rfx)
    cdy = jnp.where(inner, ify, rfy)
    cdz = jnp.where(inner, ifz, rfz)
    # Inner TIR reflection = mirror about n_in (same mirror formula).
    mrx = dx - 2.0 * ndotd * nx
    mry = dy - 2.0 * ndotd * ny
    mrz = dz - 2.0 * ndotd * nz
    clx = jnp.where(inner, mrx, rlx)
    cly = jnp.where(inner, mry, rly)
    clz = jnp.where(inner, mrz, rlz)

    nox = jnp.where(inner, -nx, nx)  # outward-facing normal
    noy = jnp.where(inner, -ny, ny)
    noz = jnp.where(inner, -nz, nz)

    refr_contrib = contrib * refrv
    refl_contrib = contrib * reflv
    fwd = (jnp.where(spawn_refr, refrv, 0.0)
           + jnp.where(spawn_refl, reflv, 0.0))
    contrib_post = contrib * (1.0 - 0.5 * fwd)
    mcr, mcg, mcb = _texture_color(rows, lpx, lpy, lpz, did_hit, tex)
    hit_c = jnp.where(did_hit, contrib_post, 0.0)
    add_r = add_r + hit_c * mcr
    add_g = add_g + hit_c * mcg
    add_b = add_b + hit_c * mcb

    hit_t = jnp.where(hit, t_best, t_max)

    tmax_row = jnp.full((1, L), t_max, jnp.float32)
    z6 = jnp.zeros((6, L), jnp.float32)
    refr16 = jnp.concatenate([
        px - 1e-4 * nox, py - 1e-4 * noy, pz - 1e-4 * noz,
        cdx, cdy, cdz, omt, tmax_row, refr_contrib, bounced1, z6,
    ], axis=0)
    refl16 = jnp.concatenate([
        px + 1e-4 * nox, py + 1e-4 * noy, pz + 1e-4 * noz,
        clx, cly, clz, omt, tmax_row, refl_contrib, bounced1, z6,
    ], axis=0)
    return (add_r, add_g, add_b, hit_t, refr16, refl16, spawn_refr,
            spawn_refl, white)


def _mega_kernel(n_pad: int, n_groups: int, gr: int, has_motion: bool,
                 has_dielectrics: bool, spp: int, max_bounces: int,
                 t_max: float, bg_bottom, bg_top, use_mxu: bool,
                 n_pgroups: int = 0):
    def kernel(otab_ref, ftab_ref, gaabb_ref, pool_ref,
               lane_ref, misc_out, refr_out, refl_out, rlane_out, llane_out,
               t_sc, obj_sc):
        rows16 = pool_ref[:]
        lane = lane_ref[:]
        active = lane >= 0
        sidx = (lane - (lane // spp) * spp).astype(jnp.float32)
        L = rows16.shape[1]
        (add_r, add_g, add_b, hit_t, refr16, refl16, spawn_refr, spawn_refl,
         _white) = (
            trace_shade_block(
                otab_ref, ftab_ref, gaabb_ref,
                rows16[0:1], rows16[1:2], rows16[2:3],
                rows16[3:4], rows16[4:5], rows16[5:6],
                rows16[6:7], rows16[7:8], rows16[8:9], rows16[9:10],
                active, sidx, t_sc, obj_sc, n_pad=n_pad, n_groups=n_groups,
                gr=gr, has_motion=has_motion, has_dielectrics=has_dielectrics,
                spp=spp, max_bounces=max_bounces, t_max=t_max,
                bg_bottom=bg_bottom, bg_top=bg_top, use_mxu=use_mxu,
                n_pgroups=n_pgroups))
        zeros = jnp.zeros((1, L), jnp.float32)
        misc_out[:] = jnp.concatenate(
            [add_r, add_g, add_b, hit_t, zeros, zeros, zeros, zeros], axis=0)
        refr_out[:] = refr16
        refl_out[:] = refl16
        rlane_out[:] = jnp.where(spawn_refr, lane, -1)
        llane_out[:] = jnp.where(spawn_refl, lane, -1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("gr", "has_motion", "has_dielectrics", "spp",
                     "max_bounces", "t_max", "bg", "block", "use_mxu"))
def mega_step(otab, ftab3, gaabb, pool, lane, gr: int, has_motion: bool,
              has_dielectrics: bool, spp: int, max_bounces: int,
              t_max: float, bg, block: int = DEFAULT_L,
              use_mxu: bool = False):
    """One fused shade step over a (16, C) pool slice.

    Returns (misc (8, C), refr (16, C), refl (16, C), rlane (C,), llane (C,))
    where misc rows are [add_r, add_g, add_b, hit_t, 0...].
    """
    from raytracing_tests_tpu.kernels.sweep2 import PROBE_GR

    fhi, fmid, flo = ftab3
    n_pad = fhi.shape[1]  # MAIN rows (ftab width = winner-id space)
    ftabS = jnp.concatenate([fhi, fmid, flo], axis=0)  # stacked gather
    n_groups = n_pad // gr
    n_pgroups = (otab.shape[0] - n_pad) // PROBE_GR  # trailing probe groups
    C = pool.shape[1]
    grid = (C // block,)
    lane2 = lane.reshape(1, C)
    lane_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = lambda x: pl.BlockSpec(x.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    misc, refr, refl, rlane, llane = pl.pallas_call(
        _mega_kernel(n_pad, n_groups, gr, has_motion, has_dielectrics, spp,
                     max_bounces, t_max, bg[0], bg[1], use_mxu,
                     n_pgroups=n_pgroups),
        grid=grid,
        in_specs=[full(otab), full(ftabS),
                  full(gaabb), lane_spec(POOL_ROWS), lane_spec(1)],
        out_specs=(lane_spec(8), lane_spec(POOL_ROWS), lane_spec(POOL_ROWS),
                   lane_spec(1), lane_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((8, C), jnp.float32),
            jax.ShapeDtypeStruct((POOL_ROWS, C), jnp.float32),
            jax.ShapeDtypeStruct((POOL_ROWS, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, block), jnp.float32),
            pltpu.VMEM((1, block), jnp.int32),
        ],
        interpret=_interpret(),
    )(otab, ftabS, gaabb, pool, lane2)
    return misc, refr, refl, rlane[0], llane[0]
