"""Persistent megakernel: the ENTIRE render drain in one Pallas launch.

The lane-aligned XLA drain (``ops.megalanes``) still paid two taxes the
hardware did not have to: per-iteration XLA glue around every kernel call,
and dead lanes idling until their whole chunk drained.  This kernel removes
both — it is the TPU-native equivalent of a GPU "persistent threads" path
tracer, and the closest analogue of the reference's one-launch GLSL
megakernel (``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:675-705``):

  - grid = lane blocks; each block OWNS ``R`` rounds of ``L`` primary rays
    (primaries ``[pid*R*L, (pid+1)*R*L)``), generated IN-KERNEL from the
    camera (fov basis + sunflower thin-lens DOF, ``glsl:364-411``) — no
    primary-ray arrays ever touch HBM;
  - every lane runs its own round counter: the moment a lane's ray tree is
    exhausted it flushes its round's color into the block-local output tile
    and regenerates the next primary — occupancy stays near 100% without
    any compaction, scatter, or sort;
  - the per-lane LIFO ray stack lives in VMEM scratch; one child continues
    in place and the other waits on the stack, in each shading model's
    reference push/pop order ('bvh': reflection in place; 'materials':
    refraction in place).  Queue records keep 8 rows (o, d, contribution,
    bounce count — omt and t_limit are lane constants, rebuilt on pop),
    plus (medium, parent_medium) = 10 rows under materials shading;
  - the bounce loop is a ``lax.while_loop`` whose condition is "any lane
    active, any flush pending, or any round left".

Scope: perspective OR orthographic camera (static trace-time branch),
single- or multi-focus (fd[s % K], K <= 7, the u_NumOfFocusDist path),
DOF sunflower or IOW-02 aa_grid supersampling (static jitter table in
raygen).  Both scene modes are served — the sphere-mode MXU sweep
(``kernels/sweep2``) and the generic rotated ellipsoid/cuboid grouped
sweep (``kernels/sweep2g``, incl. the rotated-containment RI probe) —
under either shading model: 'bvh' (INW shading, emissive lights with
in-kernel shadow-ray sweeps + the paint-it-white abort) or 'materials'
(IOW-03: per-ray medium-RI stack in the pool record, Schlick contribution
shift, fibonacci-hemisphere scatter), with cube-sphere atlas texturing
in-kernel (``kernels/texture``: factored one-hot MXU gathers — the
sampler-array of 03_Texturing glsl:9-10).  ``ops.render`` remains the
general path (normals view; traced orthographic cameras).

Host discipline (round 5, PERFORMANCE.md fact 45): a frame is exactly ONE
device dispatch — kernel + epilogue trace together under ``_uber_frame``,
and the accel/camera/atlas/lights packs are identity-cached (a mutated
scene repacks, the reference's rebuild-on-change).  Per-call perf knobs,
all A/B'd in-process (``scripts/ab.py``): ``stage`` (staged round flush,
fact 44), ``hot`` (straight-lined near groups, fact 41), ``ablate``
(measurement ablations), ``tile``/``order``/``qcap``/``use_mxu``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tests_tpu.kernels.mega import (
    GOLDEN_ANGLE,
    _cross_up,
    _shade_hits,
)
from raytracing_tests_tpu.kernels.sweep2 import _sweep_loop
from raytracing_tests_tpu.kernels.sweep2 import _interpret, make_accel2

# Camera scalar-vector layout (host-packed, SMEM).  ROW_STRIDE/ROW0 map a
# device shard's local row index to the global image row (iy = local *
# stride + row0) so a mesh-sharded launch renders interleaved row bands
# with the exact same rays as the single-device render.
(
    CAM_PX, CAM_PY, CAM_PZ, CAM_DX, CAM_DY, CAM_DZ,
    CAM_RX, CAM_RY, CAM_RZ, CAM_UX, CAM_UY, CAM_UZ,
    CAM_SD, CAM_AP, CAM_FD, CAM_STRIDE, CAM_ROW0, CAM_PAD,
) = range(18)
CAM_FD2 = 18  # focus_dist[1:] lives at 18..23 (multi-focus, K <= 7)
CAM_LEN = 24  # padded


import os as _os

# Identity-keyed packing caches (see render_uber): bounded FIFO; a cache
# hit PROVES the inputs are the same live arrays (ids are unique among
# live objects and the stored strong refs keep them alive).
_ACCEL_CACHE: dict = {}
_ATLAS_CACHE: dict = {}
_LIGHTS_CACHE: dict = {}


def _env_ablate() -> frozenset:
    """Default ablation set from UBER_ABLATE (read per render call so
    in-process A/Bs can pass ``ablate=`` explicitly instead)."""
    return frozenset(_os.environ.get("UBER_ABLATE", "").split(","))


def _uber_kernel(*, R, W, H, spp, max_bounces, t_max, bg_bottom, bg_top,
                 n_pad, n_groups, gr, has_motion, has_dielectrics, Q,
                 B_total, use_mxu, max_iters, pops, mode="spheres",
                 n_lights=0, shading="bvh", order="sample", n_pgroups=0,
                 tex_meta=None, n_sgroups=0, gkinds=None, tile=None,
                 n_focus=1, rot_stride=0, aa=None, is_ortho=False,
                 ablate=frozenset(), hot=0, stage=0):
    aspect = W / H
    # Queued-record width: o3, d3, contrib, bounced (+ medium, parent under
    # the materials shading — the per-ray medium-RI stack rides the record).
    REC = 10 if shading == "materials" else 8
    # Pixel-major order: a lane owns R CONSECUTIVE primaries (p = base +
    # lane*R + k), so its R rounds land in at most R//spp + 2 pixels and
    # the per-round flush is a one-hot over NPIX rows instead of R — the
    # kernel applies finalize's per-sample gamma (sqrt) and accumulates
    # per-PIXEL sums in the tiny output tile.  (Sample-major keeps the
    # per-sample tile for bit-exact parity with the queue renderer.)
    NPIX = (R // spp + 2) if order == "pixel" else 0
    OUT_ROWS = 4 * NPIX if order == "pixel" else 4 * R
    mid_s = spp // 2  # finalize keeps the mid sample's depth

    def kernel(otab_ref, ftab_ref, gaabb_ref, cam_ref,
               lights_ref, *rest):
        if tex_meta is not None:
            thi_ref, tmid_ref, tlo_ref = rest[:3]
            tex = (thi_ref, tmid_ref, tlo_ref, tex_meta)
            rest = rest[3:]
        else:
            tex = None
        (out_ref, stat_ref, cur_sc, meta_sc, q_sc, acc_sc,
         t_sc, obj_sc, res_sc, trig_sc, stg_sc, stgk_sc) = rest
        L = cur_sc.shape[1]
        pid = pl.program_id(0)
        base = pid * (R * L)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        if order == "pixel":
            rowP = jax.lax.broadcasted_iota(jnp.int32, (NPIX, L), 0)
            lane0 = base + lane_iota * R  # lane's first primary
            pix0 = lane0 // spp
        else:
            rowR = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        qrow = jax.lax.broadcasted_iota(jnp.int32, (Q * REC, L), 0)
        tmax_row = jnp.full((1, L), t_max, jnp.float32)
        zeros1 = jnp.zeros((1, L), jnp.float32)

        out_ref[:] = jnp.zeros((OUT_ROWS, L), jnp.float32)
        # stat rows: 0 = traced rays, 1 = dropped rays, 2 = while-loop
        # iterations (occupancy diagnostic), 3 = sweep groups entered.
        stat_ref[:] = jnp.zeros((4, L), jnp.int32)
        cur_sc[:] = jnp.zeros((16, L), jnp.float32)
        meta_sc[:] = jnp.zeros((8, L), jnp.int32)
        meta_sc[0:1] = jnp.full((1, L), -1, jnp.int32)  # round counter k
        q_sc[:] = jnp.zeros((Q * REC, L), jnp.float32)
        acc_sc[:] = jnp.zeros((4, L), jnp.float32)
        trig_sc[:] = jnp.zeros((2, L), jnp.float32)
        if stage:
            rowS = jax.lax.broadcasted_iota(jnp.int32, (stage, L), 0)
            stgk_sc[:] = jnp.full((stage, L), -1, jnp.int32)

        def _stage_drain():
            """Write every staged round into the output tile and reset.

            One (4R, L) tile touch covers up to ``stage`` finished rounds
            per lane: the per-channel value is a sum of ``stage`` one-hots
            (empty slots carry k = -1, which never matches rowR), so each
            out cell still receives exactly one addition over the block's
            lifetime — bitwise identical to the per-finish flush."""
            kv = stgk_sc[:]
            accv = stg_sc[:]
            for c in range(4):
                add = jnp.where(rowR == kv[0:1], accv[c * stage : c * stage + 1], 0.0)
                for s in range(1, stage):
                    add = add + jnp.where(
                        rowR == kv[s : s + 1],
                        accv[c * stage + s : c * stage + s + 1], 0.0)
                seg = out_ref[c * R : (c + 1) * R]
                out_ref[c * R : (c + 1) * R] = seg + add
            stgk_sc[:] = jnp.full((stage, L), -1, jnp.int32)
            meta_sc[4:5] = jnp.zeros((1, L), jnp.int32)

        def raygen(p):
            """Primary ray for global lane index p ((1, L) i32) -> (16, L).

            Transcribes ``ops.camera_rays.primary_rays``:
            unnormalized right/up screen basis + sunflower thin-lens
            aperture pivoting about the per-sample focal point."""
            pix = p // spp
            s_i = p - pix * spp
            sf = s_i.astype(jnp.float32)
            if tile is not None:
                # Tiled pixel order: consecutive pix indices walk tw x th
                # tiles (row-major within a tile, tiles row-major), so a
                # round's L lanes cover a COMPACT 2-D block instead of a
                # scanline — tighter world-space ray spread, more groups
                # die on the slab cull.  A pure bijection of pixel
                # indices: the host unpermutes the finished image.
                tw, th = tile
                TPR = W // tw
                PPT = tw * th
                t_i = pix // PPT
                w_i = pix - t_i * PPT
                ix = (t_i - (t_i // TPR) * TPR) * tw + (w_i - (w_i // tw) * tw)
                iy = (t_i // TPR) * th + w_i // tw
            else:
                ix = pix - (pix // W) * W
                iy = pix // W
            iy = (iy.astype(jnp.float32) * cam_ref[0, CAM_STRIDE]
                  + cam_ref[0, CAM_ROW0])
            pxs = (ix.astype(jnp.float32) * (1.0 / W) - 0.5) * aspect
            pys = iy * (1.0 / H) - 0.5
            if aa is not None:
                # Supersampling grid jitter (IOW-02, 03_Shadows glsl:
                # 385-399 diagonal scan; ops.camera_rays aa_grid path):
                # sample s offsets the screen point by the static cell
                # table.  Vector s_i -> table via a (spp, L) one-hot.
                jxs, jys = aa  # static tuples of length spp
                jx_l = zeros1
                jy_l = zeros1
                for si in range(spp):  # unrolled: scalar constants only
                    m = (s_i == si).astype(jnp.float32)
                    jx_l = jx_l + m * float(jxs[si])
                    jy_l = jy_l + m * float(jys[si])
                pxs = pxs + jx_l * ((1.0 / W) * aspect)
                pys = pys + jy_l * (1.0 / H)
            sd = cam_ref[0, CAM_SD]
            bdx = cam_ref[0, CAM_DX] * sd + cam_ref[0, CAM_RX] * pxs + cam_ref[0, CAM_UX] * pys
            bdy = cam_ref[0, CAM_DY] * sd + cam_ref[0, CAM_RY] * pxs + cam_ref[0, CAM_UY] * pys
            bdz = cam_ref[0, CAM_DZ] * sd + cam_ref[0, CAM_RZ] * pxs + cam_ref[0, CAM_UZ] * pys
            binv = jax.lax.rsqrt(jnp.maximum(bdx * bdx + bdy * bdy + bdz * bdz, 1e-30))
            bdx, bdy, bdz = bdx * binv, bdy * binv, bdz * binv

            if is_ortho:
                # Orthographic lattice (GLCore/Util/OrthographicCamera.h:
                # 7-33; ops.camera_rays ortho blend): parallel rays from
                # the view plane — origin = pos + h*(sx*rn + sy*un),
                # direction = camera.direction; DOF machinery skipped
                # (the queue path's override discards it identically).
                # Normalized right/up in the QUEUE path's arithmetic
                # (v / sqrt, not rsqrt — visibility parity).
                h_o = cam_ref[0, CAM_PAD]
                rx_, ry_, rz_ = (cam_ref[0, CAM_RX], cam_ref[0, CAM_RY],
                                 cam_ref[0, CAM_RZ])
                ux_, uy_, uz_ = (cam_ref[0, CAM_UX], cam_ref[0, CAM_UY],
                                 cam_ref[0, CAM_UZ])
                rn = jnp.sqrt(rx_ * rx_ + ry_ * ry_ + rz_ * rz_)
                un = jnp.sqrt(ux_ * ux_ + uy_ * uy_ + uz_ * uz_)
                sxh = pxs * h_o
                syh = pys * h_o
                ox = cam_ref[0, CAM_PX] + sxh * (rx_ / rn) + syh * (ux_ / un)
                oy = cam_ref[0, CAM_PY] + sxh * (ry_ / rn) + syh * (uy_ / un)
                oz = cam_ref[0, CAM_PZ] + sxh * (rz_ / rn) + syh * (uz_ / un)
                ddx = jnp.zeros((1, L), jnp.float32) + cam_ref[0, CAM_DX]
                ddy = jnp.zeros((1, L), jnp.float32) + cam_ref[0, CAM_DY]
                ddz = jnp.zeros((1, L), jnp.float32) + cam_ref[0, CAM_DZ]
                th = GOLDEN_ANGLE * sf
                cth = jnp.cos(th)
                sth = jnp.sin(th)
                omt = 1.0 - sf * (1.0 / spp)
                ones1 = jnp.ones((1, L), jnp.float32)
                new16 = jnp.concatenate([
                    ox, oy, oz, ddx, ddy, ddz, omt, tmax_row,
                    ones1, zeros1,
                    ones1, ones1,  # medium, parent_medium (air)
                    jnp.zeros((4, L), jnp.float32),
                ], axis=0)
                return new16, cth, sth

            # sunflower_disc(s, spp, aperture)
            n = float(spp)
            b = float(np.round(2.0 * np.sqrt(n)))
            denom = n - (b + 1.0) / 2.0
            denom = denom if denom > 0 else 1.0
            half_ap = cam_ref[0, CAM_AP] * 0.5
            r = jnp.where(
                sf > n - b, half_ap,
                half_ap * jnp.sqrt(jnp.maximum(sf - 0.5, 0.0) * (1.0 / denom)))
            r = jnp.where(sf == 0.0, 0.0, r)
            th = GOLDEN_ANGLE * sf
            if "trig" in ablate:  # ablation: measure sunflower trig cost
                cth = jnp.full((1, L), 0.6, jnp.float32)
                sth = jnp.full((1, L), 0.8, jnp.float32)
            else:
                # Computed ONCE per round here; carried in trig_sc for the
                # deviate/fibonacci scatter cones (same angle, s is a round
                # constant) — vector sin/cos is expensive under Mosaic.
                cth = jnp.cos(th)
                sth = jnp.sin(th)
            offx = r * cth
            offy = r * sth
            rrx, rry, rrz, rux, ruy, ruz = _cross_up(bdx, bdy, bdz)

            if n_focus == 1:
                fd = cam_ref[0, CAM_FD]
            else:
                # Multi-focus: sample s focuses at focus_dist[s % K] — the
                # reference's u_NumOfFocusDist kernel path (In-Next-Week/
                # base.h:187-239, 01_BVH glsl:389-409 #if MULTIFOCUS),
                # matching ops.camera_rays._dof_rays exactly.
                fk = s_i - (s_i // n_focus) * n_focus
                fd = jnp.full((1, L), 0.0, jnp.float32) + cam_ref[0, CAM_FD]
                for j in range(1, n_focus):
                    fd = jnp.where(fk == j, cam_ref[0, CAM_FD2 + j - 1], fd)
            px_, py_, pz_ = cam_ref[0, CAM_PX], cam_ref[0, CAM_PY], cam_ref[0, CAM_PZ]
            tipx = px_ + bdx + rrx * offx + rux * offy
            tipy = py_ + bdy + rry * offx + ruy * offy
            tipz = pz_ + bdz + rrz * offx + ruz * offy
            ddx = px_ + bdx * fd - tipx
            ddy = py_ + bdy * fd - tipy
            ddz = pz_ + bdz * fd - tipz
            dinv = jax.lax.rsqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-30))
            ddx, ddy, ddz = ddx * dinv, ddy * dinv, ddz * dinv
            ox = tipx - ddx
            oy = tipy - ddy
            oz = tipz - ddz
            omt = 1.0 - sf * (1.0 / n)  # time_ratio = s / spp
            ones1 = jnp.ones((1, L), jnp.float32)
            new16 = jnp.concatenate([
                ox, oy, oz, ddx, ddy, ddz, omt, tmax_row,
                ones1, zeros1,
                ones1, ones1,  # medium, parent_medium (air)
                jnp.zeros((4, L), jnp.float32),
            ], axis=0)
            return new16, cth, sth

        def pof(kk):
            """Global primary index of round ``kk`` ((1, L) i32).

            Sample order applies a per-round LANE ROTATION: round kk maps
            lane j to primary base + kk*L + ((j + kk*ROT) mod L).  A lane
            is otherwise pinned to a fixed image-column family (stride L
            = W*spp/stride columns), so lanes aligned with expensive
            columns (glass, deep trees) accumulate long trees EVERY round
            — measured as the drain factor (lights x1.78, materials
            x1.37).  The rotation is a bijection WITHIN each round's
            primary window, so per-round slab-cull coherence is untouched
            and the host unrotates the output tile with one static
            gather; images are bit-identical (UBER_ROT=0 disables)."""
            if order == "pixel":
                return lane0 + kk
            if rot_stride:
                return base + kk * L + ((lane_iota + kk * rot_stride)
                                        & (L - 1))
            return base + kk * L + lane_iota

        def body(carry):
            it, _ = carry
            k = meta_sc[0:1]
            act = meta_sc[1:2] > 0
            qs = meta_sc[2:3]
            cnt = meta_sc[3:4]  # nodes processed this round (pops budget)

            # ---- flush finished rounds into the output tile --------------
            # (channel-major rows c*R + k: one (R, L) one-hot shared by the
            # four channel segments instead of a (4R, L) interleaved select)
            fin = (~act) & (k >= 0)

            # "slflow": run flush/regen/push straight-line — their bodies
            # are already lane-masked (sel & fin / can_re / do_push), and a
            # TAKEN pl.when costs more than these small bodies when the
            # branch fires nearly every iteration (2048 lanes: some lane
            # finishes almost always).
            _slflow = "slflow" in ablate
            _when = (lambda c: (lambda f: f())) if _slflow else (
                lambda c: pl.when(c))

            if "flush" in ablate:  # ablation: measure flush cost
                pass
            elif order == "pixel":
                @_when(jnp.any(fin))
                def _():
                    accs = acc_sc[:]
                    p_fin = pof(k)
                    slot = p_fin // spp - pix0
                    s_fin = p_fin - (p_fin // spp) * spp
                    sel = (rowP == slot) & fin
                    vals = [jnp.sqrt(jnp.maximum(accs[c : c + 1], 0.0))
                            for c in range(3)]
                    vals.append(jnp.where(s_fin == mid_s, accs[3:4], 0.0))
                    for c in range(4):
                        seg = out_ref[c * NPIX : (c + 1) * NPIX]
                        out_ref[c * NPIX : (c + 1) * NPIX] = seg + jnp.where(
                            sel, vals[c], 0.0)
            elif stage:
                # Staged flush: PARK the finished round's accumulator in a
                # small (4*stage, L) staging tile (rows = slot index) and
                # only touch the full (4R, L) output tile when some lane's
                # staging is full — the flush cost is tile-touch-bound
                # (~1.6 us/iter measured, round 5), and batching ``stage``
                # finishes amortizes the touch.
                @_when(jnp.any(fin))
                def _():
                    ns = meta_sc[4:5]
                    selS = (rowS == ns) & fin
                    accs = acc_sc[:]
                    for c in range(4):
                        seg = stg_sc[c * stage : (c + 1) * stage]
                        stg_sc[c * stage : (c + 1) * stage] = jnp.where(
                            selS, accs[c : c + 1], seg)
                    stgk_sc[:] = jnp.where(selS, k, stgk_sc[:])
                    meta_sc[4:5] = ns + fin.astype(jnp.int32)

                @pl.when(jnp.any(meta_sc[4:5] >= stage))
                def _():
                    _stage_drain()
            else:
                @_when(jnp.any(fin))
                def _():
                    accs = acc_sc[:]
                    sel = (rowR == k) & fin
                    for c in range(4):
                        seg = out_ref[c * R : (c + 1) * R]
                        out_ref[c * R : (c + 1) * R] = seg + jnp.where(
                            sel, accs[c : c + 1], 0.0)

            # ---- regenerate the next primary / retire the lane -----------
            k_next = k + 1
            p_new = pof(k_next)
            # k == -2 marks a RETIRED lane (k_next < 0): never regenerate.
            can_re = ((~act) & (k_next >= 0) & (k_next < R)
                      & (p_new < B_total))

            @_when(jnp.any(can_re))
            def _():
                new16, cth, sth = raygen(p_new)
                cur_sc[:] = jnp.where(can_re, new16, cur_sc[:])
                acc_sc[:] = jnp.where(
                    can_re,
                    jnp.concatenate([zeros1, zeros1, zeros1, tmax_row]),
                    acc_sc[:])
                trig_sc[:] = jnp.where(
                    can_re, jnp.concatenate([cth, sth], axis=0), trig_sc[:])

            k = jnp.where(can_re, k_next, jnp.where(fin, -2, k))
            act = act | can_re
            cnt = jnp.where(can_re, 0, cnt)
            meta_sc[0:1] = k
            meta_sc[1:2] = act.astype(jnp.int32)

            # ---- trace + shade ------------------------------------------
            cur = cur_sc[:]
            p_cur = pof(jnp.maximum(k, 0))
            s_i = p_cur - (p_cur // spp) * spp
            sidx = s_i.astype(jnp.float32)
            dx, dy, dz = cur[3:4], cur[4:5], cur[5:6]
            contrib = cur[8:9]
            a2 = dx * dx + dy * dy + dz * dz
            live = (a2 > 0.5) & act
            stat_ref[2:3] = stat_ref[2:3] + 1  # iteration counter
            if mode == "spheres":
                _sweep_loop(otab_ref, gaabb_ref, cur[0:1], cur[1:2],
                            cur[2:3], dx, dy, dz, cur[6:7], live, cur[7:8],
                            t_sc, obj_sc, None, None, n_groups=n_groups,
                            gr=gr, has_motion=has_motion, use_mxu=use_mxu,
                            with_edge=False, cnt_ref=stat_ref,
                            ablate=ablate, hot=hot)
            else:
                from raytracing_tests_tpu.kernels.sweep2g import _sweep_loop_g

                _sweep_loop_g(otab_ref, gaabb_ref, cur[0:1], cur[1:2],
                              cur[2:3], dx, dy, dz, cur[6:7], live,
                              cur[7:8], t_sc, obj_sc, n_groups=n_groups,
                              gr=gr, has_motion=has_motion,
                              cnt_ref=stat_ref, gkinds=gkinds,
                              n_sgroups=n_sgroups,
                              sg0=n_groups + n_pgroups)
            hit = (obj_sc[:] >= 0) & act
            tt_ = (dy + 1.0) * 0.5
            bgr = (1.0 - tt_) * bg_bottom[0] + tt_ * bg_top[0]
            bgg = (1.0 - tt_) * bg_bottom[1] + tt_ * bg_top[1]
            bgb = (1.0 - tt_) * bg_bottom[2] + tt_ * bg_top[2]

            # Hit blocks run the full shade; pure-miss (sky) blocks write
            # background only — lax.cond does not survive Mosaic, so the
            # branch goes through pl.when and a results scratch.
            trig = (None if "nocarry" in ablate
                    else (trig_sc[0:1], trig_sc[1:2]))

            def _shade_vals():
                if shading == "materials":
                    from raytracing_tests_tpu.kernels.mega import (
                        _gather_refine, _shade_materials_k)

                    rows, refined = _gather_refine(
                        ftab_ref, obj_sc[:], cur[0:1],
                        cur[1:2], cur[2:3], dx, dy, dz, cur[6:7], t_sc[:],
                        hit, n_pad=n_pad, has_motion=has_motion, mode=mode)
                    return _shade_materials_k(
                        rows, *refined, dx, dy, dz, cur[6:7], contrib,
                        cur[9:10], act, sidx, cur[10:11], cur[11:12], hit,
                        bgr, bgg, bgb, spp=spp, max_bounces=max_bounces,
                        t_max=t_max, tex=tex, trig=trig)
                return _shade_hits(
                    otab_ref, ftab_ref, gaabb_ref,
                    cur[0:1], cur[1:2], cur[2:3], dx, dy, dz, cur[6:7],
                    contrib, cur[9:10], act, sidx, t_sc[:], obj_sc[:],
                    hit, bgr, bgg, bgb, n_pad=n_pad, n_groups=n_groups,
                    gr=gr, has_motion=has_motion,
                    has_dielectrics=has_dielectrics, spp=spp,
                    max_bounces=max_bounces, t_max=t_max,
                    use_mxu=use_mxu, mode=mode, lights_ref=lights_ref,
                    n_lights=n_lights, n_pgroups=n_pgroups, tex=tex,
                    gkinds=gkinds, n_sgroups=n_sgroups, trig=trig)

            # Child records travel in SLIM REC-row form (o3, d3, contrib,
            # bounced [, medium, parent]): a full 16-row record carries 6
            # constant/zero rows (omt + t_limit are lane constants, tail
            # zeros) that the relay, queue, and where-chains never need —
            # they are reconstructed once at the cur_sc write-back, exactly
            # like the pop path always did.
            slim = lambda a: jnp.concatenate(
                [a[0:6], a[8 : 8 + (REC - 6)]], axis=0)
            F0 = 4 + 2 * REC  # spawn/white flag rows in the slim relay
            if "slshade" in ablate:
                # Straight-line shade: no branch pair, no res_sc relay.
                # _shade_hits/_shade_materials_k already handle miss lanes
                # (they take the hit mask + background), so this is the
                # mixed-iteration path applied unconditionally — pure-sky
                # iterations pay the full shade body instead of a taken
                # branch.
                (add_r, add_g, add_b, hit_t, refr16, refl16,
                 sr_b, sl_b, wh_b) = _shade_vals()
                refrR = slim(refr16)
                reflR = slim(refl16)
                spawn_refr = sr_b
                spawn_refl = sl_b
                white_b = wh_b
            elif "shadestub" in ablate:
                # Ablation: bound the shade body's in-situ cost — the
                # gather/refine/probe/shade stack replaced by a constant
                # "shade" that keeps a realistic tree shape (reflect while
                # this round has taken < 3 nodes; WRONG image, measurement
                # only).  Diff vs base at matched iteration mix = the
                # whole _shade_vals cost.
                mc = jnp.where(act, contrib, 0.0)
                stub_spawn = hit & (cnt < 3)
                childR = jnp.concatenate(
                    [cur[0:3] + 0.1, cur[3:6], contrib * 0.5,
                     cur[9:10] + 1.0]
                    + ([cur[10:12]] if REC == 10 else []), axis=0)
                res_sc[:] = jnp.concatenate(
                    [mc * 0.5, mc * 0.5, mc * 0.5, tmax_row,
                     childR, childR,
                     jnp.zeros((1, L), jnp.float32),
                     stub_spawn.astype(jnp.float32),
                     jnp.zeros((1, L), jnp.float32)], axis=0)
                res = res_sc[:]
                add_r, add_g, add_b = res[0:1], res[1:2], res[2:3]
                hit_t = res[3:4]
                refrR = res[4 : 4 + REC]
                reflR = res[4 + REC : 4 + 2 * REC]
                spawn_refr = res[F0 : F0 + 1] > 0.5
                spawn_refl = res[F0 + 1 : F0 + 2] > 0.5
                white_b = res[F0 + 2 : F0 + 3] > 0.5
            else:
                @pl.when(jnp.any(hit))
                def _():
                    (r_, g_, b_, t_, refr_, refl_, sr_, sl_,
                     wh_) = _shade_vals()
                    res_sc[:] = jnp.concatenate([
                        r_, g_, b_, t_, slim(refr_), slim(refl_),
                        sr_.astype(jnp.float32), sl_.astype(jnp.float32),
                        wh_.astype(jnp.float32),
                    ], axis=0)

                @pl.when(~jnp.any(hit))
                def _():
                    mc = jnp.where(act, contrib, 0.0)
                    # Only the color/depth head and the flag rows matter on
                    # a pure-miss iteration (stale record rows are masked
                    # out by the false spawn flags downstream).
                    res_sc[0:4] = jnp.concatenate(
                        [mc * bgr, mc * bgg, mc * bgb, tmax_row], axis=0)
                    res_sc[F0 : F0 + 3] = jnp.zeros((3, L), jnp.float32)

                res = res_sc[:]
                add_r, add_g, add_b = res[0:1], res[1:2], res[2:3]
                hit_t = res[3:4]
                refrR = res[4 : 4 + REC]
                reflR = res[4 + REC : 4 + 2 * REC]
                spawn_refr = res[F0 : F0 + 1] > 0.5
                spawn_refl = res[F0 + 1 : F0 + 2] > 0.5
                white_b = res[F0 + 2 : F0 + 3] > 0.5
            # Emissive abort: the whole SAMPLE becomes pure white and the
            # lane's remaining tree (current ray + stacked siblings) drops.
            white = white_b & act if n_lights > 0 else (
                jnp.zeros((1, L), jnp.bool_))
            primary = act & (cur[9:10] == 0.0)
            acc_r = acc_sc[0:1] + add_r
            acc_g = acc_sc[1:2] + add_g
            acc_b = acc_sc[2:3] + add_b
            if n_lights > 0:
                acc_r = jnp.where(white, 1.0, acc_r)
                acc_g = jnp.where(white, 1.0, acc_g)
                acc_b = jnp.where(white, 1.0, acc_b)
            acc_sc[:] = jnp.concatenate([
                acc_r, acc_g, acc_b,
                jnp.where(primary, hit_t, acc_sc[3:4]),
            ], axis=0)
            stat_ref[0:1] = stat_ref[0:1] + act.astype(jnp.int32)

            # ---- children ------------------------------------------------
            # One child continues in place, the other waits on the stack —
            # matching the queue renderer's push/pop order per shading:
            # 'bvh' pushes refraction then reflection (LIFO pops reflect
            # first -> reflect in place); 'materials' pushes reflection
            # then refraction (refraction in place, glsl:347-352).
            if shading == "materials":
                inplaceR, queuedR = refrR, reflR
                sp_in, sp_q = spawn_refr, spawn_refl
            else:
                inplaceR, queuedR = reflR, refrR
                sp_in, sp_q = spawn_refl, spawn_refr
            push = spawn_refl & spawn_refr
            canq = qs < Q
            do_push = push & canq
            stat_ref[1:2] = stat_ref[1:2] + (push & ~canq).astype(jnp.int32)

            qrN = qrow - (qrow // REC) * REC
            valsN = queuedR[0:1]
            for rr in range(1, REC):
                valsN = jnp.where(qrN == rr, queuedR[rr : rr + 1], valsN)

            @_when(jnp.any(do_push))
            def _():
                q_sc[:] = jnp.where(((qrow // REC) == qs) & do_push, valsN,
                                    q_sc[:])

            qs = qs + do_push.astype(jnp.int32)
            # Per-round ray-tree budget: the queue renderer gives every
            # sample exactly cfg.pops pops (trace_lanes' scan length) and
            # abandons still-queued rays; matching it keeps ray counts and
            # images identical AND bounds the while_loop for tree shapes
            # with no contribution cutoff (materials shading).
            cnt2 = cnt + act.astype(jnp.int32)
            exhausted = cnt2 >= pops
            kill = white | (exhausted & act)
            qs = jnp.where(kill, 0, qs)  # drop stacked siblings
            need_pop = act & ~spawn_refl & ~spawn_refr & ~kill
            do_pop = need_pop & (qs > 0)
            qtop = qs - 1
            qv = q_sc[:]
            popN = [qv[rr : rr + 1] for rr in range(REC)]
            for qq in range(1, Q):
                selq = qtop == qq
                for rr in range(REC):
                    popN[rr] = jnp.where(
                        selq, qv[qq * REC + rr : qq * REC + rr + 1],
                        popN[rr])
            popR = jnp.concatenate(popN, axis=0)
            qs = qs - do_pop.astype(jnp.int32)

            # On stack overflow the QUEUED-preference child survives (the
            # queue renderer pushes the in-place-preference child last, so
            # IT is the one dropped there).
            overflow = push & ~canq
            chosenR = jnp.where(sp_in & ~overflow, inplaceR,
                                jnp.where(sp_q | overflow, queuedR, popR))
            omt_row = cur[6:7]  # lane constant: time never changes in a tree
            cur_sc[:] = jnp.concatenate(
                [chosenR[0:6], omt_row, tmax_row, chosenR[6:REC]]
                + [jnp.zeros((16 - 2 - REC, L), jnp.float32)], axis=0)
            act2 = act & (spawn_refl | spawn_refr | do_pop) & ~kill
            meta_sc[1:2] = act2.astype(jnp.int32)
            meta_sc[2:3] = qs
            meta_sc[3:4] = cnt2

            # ---- continue while work remains ----------------------------
            k_now = meta_sc[0:1]
            flush_pending = (~act2) & (k_now >= 0)
            regen_possible = ((~act2) & (k_now + 1 >= 0) & (k_now + 1 < R)
                              & (pof(k_now + 1) < B_total))
            more = (jnp.any(act2) | jnp.any(flush_pending)
                    | jnp.any(regen_possible))
            return (it + 1, more)

        jax.lax.while_loop(lambda c: c[1] & (c[0] < max_iters), body,
                           (jnp.int32(0), jnp.bool_(True)))
        if stage and order != "pixel":
            # Rounds parked after the last drain trigger flush here.
            @pl.when(jnp.any(stgk_sc[:] >= 0))
            def _():
                _stage_drain()

    return kernel


def _scene_accel(scene, camera, cfg, gr):
    """Probe-cut + accel build + default camera pack, identity-cached.

    The probe cut (``sweep2.probe_relevant_rows``) trims the surrounding-RI
    sub-table to rows that can actually answer (see its docstring for the
    reflect-epsilon and camera-in-air caveats; ``cfg.probe_rows == -1``
    keeps the full table, ``0`` disables the probe).  All packing runs
    EAGERLY — through the tunnel every eager op is a ~ms-scale dispatch,
    and a static scene repacked per frame was a large share of short
    frames (PERFORMANCE.md fact 45) — so results are cached keyed on the
    identity of every scene/camera array (variants coexist; a replace()d
    scene or moved camera repacks, the reference's rebuild-on-change,
    ``base.h:106-144``).  Shared by ``render_uber`` and the mesh-sharded
    path (which packs its own per-device camera and ignores ``cam``)."""
    from raytracing_tests_tpu.kernels.sweep2 import probe_relevant_rows

    probe_rows, probe_mask = cfg.probe_rows, None
    if probe_rows > 0:
        probe_mask = probe_relevant_rows(scene)
        if probe_mask is not None:
            probe_rows = int(probe_mask.sum())
    deps = (tuple(jax.tree_util.tree_leaves(scene))
            + tuple(jax.tree_util.tree_leaves(camera)))
    ck = tuple(map(id, deps)) + (gr, cfg.has_motion, cfg.pallas_mode,
                                 probe_rows)
    if any(isinstance(x, jax.core.Tracer) for x in deps):
        ck = None  # traced build (jit'd caller): never cache tracers
    hit_c = _ACCEL_CACHE.get(ck)
    if (hit_c is not None
            and all(a is b for a, b in zip(hit_c[0], deps))):
        return hit_c[1], hit_c[2]
    if cfg.pallas_mode == "spheres":
        accel = make_accel2(scene, gr=gr, has_motion=cfg.has_motion,
                            sort_origin=camera.position,
                            probe_rows=probe_rows, probe_mask=probe_mask)
    else:
        from raytracing_tests_tpu.kernels.sweep2g import make_accel2g

        accel = make_accel2g(scene, gr=gr, has_motion=cfg.has_motion,
                             sort_origin=camera.position,
                             probe_rows=probe_rows, probe_mask=probe_mask)
    cam = pack_camera(camera)
    if ck is not None:
        if len(_ACCEL_CACHE) >= 8:
            _ACCEL_CACHE.pop(next(iter(_ACCEL_CACHE)))
        _ACCEL_CACHE[ck] = (deps, accel, cam)
    return accel, cam


def _camera_statics(camera, cfg):
    """Static raygen switches shared by render_uber and the sharded path
    (a silent default in one of them would render a DIFFERENT image than
    the other): (n_focus, aa jitter tables, is_ortho).

    LIMITATION: a fully-traced camera (inside a jit) cannot be classified
    at trace time — ortho_height-as-tracer is treated as perspective, so
    traced ORTHOGRAPHIC cameras must take the queue renderer."""
    n_focus = camera.focus_dist.shape[0]
    assert n_focus <= 7, "uber path: K <= 7 focus dists (CAM_LEN tail)"
    aa = None
    if cfg.aa_grid:
        from raytracing_tests_tpu.core.sampling import supersample_grid_offsets

        cells, grid = supersample_grid_offsets(cfg.spp)
        aa = (tuple((float(c[0]) + 0.5) / grid - 0.5 for c in cells),
              tuple((float(c[1]) + 0.5) / grid - 0.5 for c in cells))
    oh_ = camera.ortho_height
    is_ortho = (not isinstance(oh_, jax.core.Tracer)) and float(oh_) > 0.0
    if isinstance(oh_, jax.core.Tracer):
        _assert_perspective(camera)
    return n_focus, aa, is_ortho


def _assert_perspective(camera):
    """The in-kernel raygen implements the perspective path only
    (orthographic cameras take the queue renderer).  Trace-safe: skipped
    when the camera is a tracer (the check belongs to concrete callers)."""
    oh = camera.ortho_height
    if not isinstance(oh, jax.core.Tracer):
        assert float(oh) == 0.0, (
            "uber path: perspective raygen only (orthographic -> queue)")


def pack_lights(lights):
    """Lights SoA -> ((n_lights, 8) f32 SMEM rows [bb_min xyz, bb_max xyz,
    diag, 0], n_lights).  Host-side (concrete mask); padding rows trimmed.
    Identity-cached: the np->device transfer is a per-frame tunneled
    dispatch otherwise (fact 45)."""
    if lights is None:
        return None, 0
    lk = (id(lights.mask), id(lights.bb_min), id(lights.bb_max))
    hit = _LIGHTS_CACHE.get(lk)
    if (hit is not None and hit[0][0] is lights.mask
            and hit[0][1] is lights.bb_min and hit[0][2] is lights.bb_max):
        return hit[1], hit[2]
    mask = np.asarray(lights.mask)
    idx = np.nonzero(mask)[0]
    if idx.size == 0:
        return None, 0
    mn = np.asarray(lights.bb_min)[idx]
    mx = np.asarray(lights.bb_max)[idx]
    diag = np.sqrt(((mx - mn) ** 2).sum(axis=1))
    rows = np.zeros((idx.size, 8), np.float32)
    rows[:, 0:3] = mn
    rows[:, 3:6] = mx
    rows[:, 6] = diag
    packed = (jnp.asarray(rows), int(idx.size))
    if len(_LIGHTS_CACHE) >= 4:
        _LIGHTS_CACHE.pop(next(iter(_LIGHTS_CACHE)))
    _LIGHTS_CACHE[lk] = ((lights.mask, lights.bb_min, lights.bb_max),
                         packed[0], packed[1])
    return packed


def pack_camera(camera, row_stride=1.0, row0=0.0):
    """Camera pytree -> (1, CAM_LEN) f32 scalar vector (see CAM_* layout).
    ``focus_dist[1:]`` (multi-focus, K <= 7) rides the tail at CAM_FD2+."""
    d = camera.direction
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(d, up)  # unnormalized, faithful to the reference
    cup = jnp.cross(right, d)
    sd = 1.0 / (2.0 * jnp.tan(camera.fov_y * 0.5))
    vals = jnp.concatenate([
        camera.position, d, right, cup,
        jnp.stack([sd, camera.aperture, camera.focus_dist[0],
                   jnp.asarray(row_stride, jnp.float32),
                   jnp.asarray(row0, jnp.float32),
                   jnp.asarray(camera.ortho_height, jnp.float32)]),
        camera.focus_dist[1:7],
    ])
    return jnp.pad(vals, (0, CAM_LEN - vals.shape[0])).reshape(
        1, CAM_LEN).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "L", "R", "gr", "use_mxu", "full_height",
                     "n_lights", "order", "tex_meta", "n_sgroups",
                     "gkinds", "tile", "n_focus", "rot_stride", "aa",
                     "is_ortho", "ablate", "hot", "stage"))
def _uber_call(otab, ftab3, gaabb, cam, cfg, B: int, L: int, R: int,
               gr: int, use_mxu: bool, full_height: int = 0, lts=None,
               n_lights: int = 0, order: str = "sample", tex3=None,
               tex_meta=None, n_sgroups: int = 0, gkinds=None, tile=None,
               n_focus: int = 1, rot_stride: int = 0, aa=None,
               is_ortho: bool = False, ablate: frozenset = frozenset(),
               hot: int = 0, stage: int = 0):
    from raytracing_tests_tpu.kernels.sweep2 import PROBE_GR

    fhi, fmid, flo = ftab3
    n_pad = fhi.shape[1]  # MAIN rows (ftab width = winner-id space)
    n_groups = n_pad // gr
    n_pgroups = (otab.shape[0] - n_pad) // PROBE_GR  # trailing probe groups
    NB = -(-B // (R * L))
    Q = cfg.queue_capacity
    # Each round costs <= pops node-iterations (the in-kernel budget below)
    # + 1 regeneration iteration; the per-round budget makes this a TRUE
    # bound for every tree shape (incl. materials' cutoff-free trees).
    max_iters = R * (cfg.pops + 1) + 64
    if lts is None:
        lts = jnp.zeros((1, 8), jnp.float32)
    # Lights scenes use a black background (lights glsl:23-30).
    zero3 = (0.0, 0.0, 0.0)
    OUT_ROWS = 4 * (R // cfg.spp + 2) if order == "pixel" else 4 * R
    kernel = _uber_kernel(
        R=R, W=cfg.width, H=full_height or cfg.height, spp=cfg.spp,
        max_bounces=cfg.max_bounces, t_max=cfg.t_max,
        bg_bottom=zero3 if n_lights else cfg.background[0],
        bg_top=zero3 if n_lights else cfg.background[1],
        n_pad=n_pad, n_groups=n_groups, gr=gr, has_motion=cfg.has_motion,
        has_dielectrics=cfg.has_dielectrics, Q=Q, B_total=B,
        use_mxu=use_mxu, max_iters=max_iters, pops=cfg.pops,
        mode=cfg.pallas_mode, n_lights=n_lights, shading=cfg.shading,
        order=order, n_pgroups=n_pgroups, tex_meta=tex_meta,
        n_sgroups=n_sgroups, gkinds=gkinds, tile=tile, n_focus=n_focus,
        rot_stride=rot_stride, aa=aa, is_ortho=is_ortho, ablate=ablate,
        hot=hot, stage=stage)
    lane_spec = lambda rows: pl.BlockSpec((rows, L), lambda i: (0, i),
                                          memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    ftabS = jnp.concatenate([fhi, fmid, flo], axis=0)  # stacked gather
    inputs = [otab, ftabS, gaabb]
    in_specs = [full(otab), full(ftabS), full(gaabb),
                smem(cam), smem(lts)]
    inputs = inputs + [cam, lts]
    if tex_meta is not None:
        inputs = inputs + list(tex3)
        in_specs = in_specs + [full(t) for t in tex3]
    out, stat = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=(lane_spec(OUT_ROWS), lane_spec(4)),
        out_shape=(
            jax.ShapeDtypeStruct((OUT_ROWS, NB * L), jnp.float32),
            jax.ShapeDtypeStruct((4, NB * L), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, L), jnp.float32),  # cur
            pltpu.VMEM((8, L), jnp.int32),  # meta: k, act, qsize
            pltpu.VMEM((Q * (10 if cfg.shading == "materials" else 8), L),
                       jnp.float32),  # LIFO stack
            pltpu.VMEM((4, L), jnp.float32),  # round accumulator
            pltpu.VMEM((1, L), jnp.float32),  # sweep t
            pltpu.VMEM((1, L), jnp.int32),  # sweep obj
            # shade-results relay: color/depth head + two SLIM REC-row
            # child records + 3 flag rows (unused under straight-line
            # shade)
            pltpu.VMEM((1 if "slshade" in ablate else
                        4 + 2 * (10 if cfg.shading == "materials" else 8)
                        + 3, L), jnp.float32),
            pltpu.VMEM((2, L), jnp.float32),  # carried (cos, sin) of s
            # staged-flush park tile + per-slot round indices (dummy 1-row
            # refs when staging is off)
            pltpu.VMEM((max(1, 4 * stage), L), jnp.float32),
            pltpu.VMEM((max(1, stage), L), jnp.int32),
        ],
        interpret=_interpret(),
    )(*inputs)
    return out, stat, NB


def render_uber(scene, camera, cfg, lights=None, L: int = 2048, R: int = 32,
                gr: int = 32, use_mxu: bool = False, qcap=None,
                order: str = "sample", tile=None, ablate=None, hot=0,
                stage=0):
    """Full render via the persistent kernel;
    dict(image, depth, rays, rays_dropped).

    ``qcap`` overrides ``cfg.queue_capacity`` for the in-VMEM LIFO stack —
    a shallower stack is measurably faster (fewer scratch rows touched per
    push/pop); ``rays_dropped`` reports any overflow honestly.

    ``order``: "sample" (default) assigns round k to primary base + k*L +
    lane, so a round's 2048 lanes are CONSECUTIVE samples (~20 adjacent
    pixels at 100 spp) — maximal block coherence for the group slab cull.
    "pixel" gives each lane R consecutive primaries and accumulates
    gamma'd PER-PIXEL sums in-kernel; its flush is ~50x cheaper but the
    round's lanes then span ~2000 pixels and the lost slab-cull coherence
    costs 2x end-to-end (measured 3.0 s vs 1.46 s on the headline scene
    even with the flush ablated away) — kept as a measured negative
    result; see docs/PERFORMANCE.md."""
    import dataclasses

    if qcap is not None and qcap != cfg.queue_capacity:
        cfg = dataclasses.replace(cfg, queue_capacity=qcap)

    assert cfg.shading in ("bvh", "materials"), cfg.shading
    if cfg.shading == "materials":
        assert lights is None, "materials shading: no emissive lights"
    assert not cfg.show_normals
    n_focus, aa, is_ortho = _camera_statics(camera, cfg)
    lts, n_lights = pack_lights(lights)
    if scene.textures is not None:
        from raytracing_tests_tpu.kernels.texture import pack_atlas

        tk = id(scene.textures)
        hit_t = _ATLAS_CACHE.get(tk)
        if hit_t is not None and hit_t[0] is scene.textures:
            tex3, tex_meta = hit_t[1], hit_t[2]
        else:
            tex3, tex_meta = pack_atlas(scene.textures)
            if not isinstance(scene.textures, jax.core.Tracer):
                if len(_ATLAS_CACHE) >= 4:
                    _ATLAS_CACHE.pop(next(iter(_ATLAS_CACHE)))
                _ATLAS_CACHE[tk] = (scene.textures, tex3, tex_meta)
    else:
        tex3, tex_meta = None, None
    # Small scenes: clamp the group size to the (static) capacity — a
    # 3-object scene at gr=64 would sweep 64 rows of which 61 are dead
    # padding every iteration (8x the useful work).
    gr = min(gr, max(8, -(-scene.capacity // 8) * 8))
    H, W, S = cfg.height, cfg.width, cfg.spp
    B = H * W * S
    if tile == "auto":
        # Compact 2-D round footprint (see raygen): pick divisors of the
        # frame; a round's L lanes then span ~sqrt the scanline extent.
        tw = next((t for t in (8, 16, 4) if W % t == 0), None)
        th = next((t for t in (8, 6, 5, 4, 3, 2) if H % t == 0), None)
        tile = (tw, th) if (tw and th) else None
    if tile is not None:
        tw, th = tile
        assert order == "sample" and W % tw == 0 and H % th == 0, (
            tile, W, H, order)
    accel, cam = _scene_accel(scene, camera, cfg, gr)
    # Per-round lane rotation (see pof): decorrelates lanes from image
    # columns so no lane is pinned to an expensive column family every
    # round (lights drain x1.78 -> ~1.1).  Bijective within each round —
    # zero cull-coherence cost; host unrotates with one static gather.
    # Default: on when spp <= 32 (fact 34 — at spp = 100 a lane's pixel
    # advances every ~20 rounds anyway and the rotation measured iters
    # +1.7%); UBER_ROT=1/0 forces either way.
    rot_env = _os.environ.get("UBER_ROT", "")
    rot_stride = 0
    if (order == "sample" and (L & (L - 1)) == 0
            and (rot_env == "1" or (rot_env != "0" and cfg.spp <= 32))):
        rot_stride = 997
    return _uber_frame(accel.otab, accel.ftab3, accel.gaabb, cam,
                       cfg, B, L, R, gr, use_mxu, lts=lts,
                       n_lights=n_lights, order=order, tex3=tex3,
                       tex_meta=tex_meta,
                       n_sgroups=getattr(accel, "n_sgroups", 0),
                       gkinds=getattr(accel, "gkinds", None),
                       tile=tile, n_focus=n_focus,
                       rot_stride=rot_stride, aa=aa,
                       is_ortho=is_ortho,
                       ablate=(_env_ablate() if ablate is None
                               else frozenset(ablate.split(","))
                               if isinstance(ablate, str)
                               else frozenset(ablate)), hot=hot,
                       stage=stage)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "L", "R", "gr", "use_mxu", "n_lights",
                     "order", "tex_meta", "n_sgroups", "gkinds", "tile",
                     "n_focus", "rot_stride", "aa", "is_ortho", "ablate",
                     "hot", "stage"))
def _uber_frame(otab, ftab3, gaabb, cam, cfg, B, L, R, gr, use_mxu,
                lts=None, n_lights=0, order="sample", tex3=None,
                tex_meta=None, n_sgroups=0, gkinds=None, tile=None,
                n_focus=1, rot_stride=0, aa=None, is_ortho=False,
                ablate=frozenset(), hot=0, stage=0):
    """Kernel + epilogue under ONE jit = one dispatch per frame (the inner
    jits inline at trace time).  ~ms per frame through the tunnel — a
    measurable share of the short side-config frames."""
    out, stat, _ = _uber_call(
        otab, ftab3, gaabb, cam, cfg, B, L, R, gr, use_mxu, lts=lts,
        n_lights=n_lights, order=order, tex3=tex3, tex_meta=tex_meta,
        n_sgroups=n_sgroups, gkinds=gkinds, tile=tile, n_focus=n_focus,
        rot_stride=rot_stride, aa=aa, is_ortho=is_ortho, ablate=ablate,
        hot=hot, stage=stage)
    return _uber_post(out, stat, cfg, B=B, L=L, R=R, NB=-(-B // (R * L)),
                      order=order, rot_stride=rot_stride, tile=tile)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "B", "L", "R", "NB", "order", "rot_stride",
                     "tile"))
def _uber_post(out, stat, cfg, *, B, L, R, NB, order, rot_stride, tile):
    """Device-side epilogue: kernel tile -> dict(image, depth, counters)."""
    from raytracing_tests_tpu.ops.render import finalize

    H, W, S = cfg.height, cfg.width, cfg.spp
    if order == "pixel":
        # out: (4*NPIX, NB*L) per-pixel sums of gamma'd samples (+ the mid
        # sample's depth in channel 3).  Global column j's first primary is
        # (j // L)*R*L + (j % L)*R; slot s lands in pixel first//S + s.
        NPIX = R // S + 2
        j = jnp.arange(NB * L)
        first = (j // L) * (R * L) + (j % L) * R
        pix = first[None, :] // S + jnp.arange(NPIX)[:, None]  # (NPIX, NBL)
        vals = out.reshape(4, NPIX, NB * L)
        img = jnp.zeros((H * W, 3), jnp.float32)
        img = img.at[pix.reshape(-1)].add(
            vals[:3].reshape(3, -1).T, mode="drop")
        depth = jnp.zeros((H * W,), jnp.float32)
        depth = depth.at[pix.reshape(-1)].add(
            vals[3].reshape(-1), mode="drop")
        res = {
            "image": (img / S).reshape(H, W, 3),
            "depth": depth.reshape(H, W),
        }
    else:
        o4 = out.reshape(4, R, NB, L)
        if rot_stride:
            # Unrotate the per-round lane rotation (see pof): round k's
            # column j holds primary lane (j + k*rot) mod L — one static
            # gather restores p-linear order before the reshape below.
            idx = ((np.arange(L)[None, :] - np.arange(R)[:, None]
                    * rot_stride) % L).astype(np.int32)
            o4 = jnp.take_along_axis(
                o4, jnp.asarray(idx)[None, :, None, :], axis=3)
        o4 = o4.transpose(2, 1, 3, 0).reshape(NB * R * L, 4)
        o4 = o4[:B]
        colors3 = o4[:, :3].reshape(H, W, S, 3)  # kernel pixel order
        primary_t = o4[:, 3].reshape(H, W, S)
        res = finalize(colors3, primary_t, cfg)  # pixel-independent
        if tile is not None:
            # Unpermute the tiled pixel order back to row-major: kernel
            # pixel i rendered actual pixel pixdst[i] (same bijection as
            # raygen); one static gather each for image and depth.
            tw, th = tile
            q = np.arange(H * W)
            TPR, PPT = W // tw, tw * th
            t_i, w_i = q // PPT, q % PPT
            pixdst = (((t_i // TPR) * th + w_i // tw) * W
                      + (t_i % TPR) * tw + w_i % tw)
            inv = np.empty(H * W, np.int32)
            inv[pixdst] = q
            res["image"] = res["image"].reshape(H * W, 3)[inv].reshape(
                H, W, 3)
            res["depth"] = res["depth"].reshape(H * W)[inv].reshape(H, W)
    res["rays"] = jnp.sum(stat[0])
    res["rays_dropped"] = jnp.sum(stat[1])
    # Occupancy diagnostics: rows 2/3 carry the block's while-loop
    # iteration and sweep-groups-entered counts (identical across the
    # block's lanes — read lane 0 of each block).
    res["iters"] = jnp.sum(stat[2].reshape(NB, L)[:, 0])
    res["groups_entered"] = jnp.sum(stat[3].reshape(NB, L)[:, 0])
    return res
