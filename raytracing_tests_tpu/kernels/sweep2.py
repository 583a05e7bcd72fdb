"""Sweep kernel v2: rays-on-lanes, MXU-formulated sphere quadratic.

Round-2 redesign of ``kernels/sweep.py`` (v1 keeps rays on a (RB, 128)
sublane x lane block and loops objects as SMEM scalars at ~35 VPU ops per
lane-object).  v2 restructures for the MXU and cheaper tails:

  - RAYS live on the lane axis only: a block is L lanes of 8 stacked rows
    (ox..oz, dx..dz, omt, tlim) = one f32 sublane tile.
  - OBJECTS live on the sublane axis in Morton-sorted groups of ``GR`` rows.
    Per group, the ray/object dot products are (GR, 1) x (1, L) broadcast
    FMAs; the remaining tail is ~19 VPU ops per (object, ray) — the
    quadratic is pre-expanded so per-object constants fold into one fused
    column broadcast:
        c_q   = |o|^2 + K1 - 2*(C @ o),      K1 = |c|^2 - r^2  (BIG if dead)
        -b/2  = (C @ d) - (o . d)
    (motion adds the delta-position cross terms K2 = 2 c.dp, K3 = |dp|^2).
  - Group-level AABB culling: one slab test per group on (1, L) planes and a
    block-wide ``@pl.when`` — the TPU shape of the reference's BVH node test
    (01_BVH glsl:187-210): no per-lane divergence, pixel-coherent blocks
    skip whole groups.
  - The winner's material row is gathered IN-KERNEL by a one-hot MXU matmul
    (fields_t (F, N) @ onehot (N, L)), replacing the external gather; the
    surrounding-refractive-index probe reuses the same expansion (the r^2
    terms cancel: inside <=> |q|^2 + K1 - 2*(C @ q) + motion <= 0).

Directions are assumed unit (primary rays and all spawned children are
normalized); dead lanes carry d = 0 and are killed by an o.d := 1e19 guard
(their near root goes negative, the far root lands at ~0).

MXU note: ``use_mxu=True`` lowers the dot products to ``lax.dot_general``.
Mosaic pads the K dim of a *misaligned sliced* operand with neighboring
rows/columns instead of zeros, so the table is laid out with the center and
delta-position triples at 8-aligned column offsets padded to K = 8 with
explicit zeros — the contractions then slice exactly on f32 tile
boundaries and no padding exists to leak.  The one-hot winner gather's
contraction spans the FULL table axis (no K slice at all).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_tests_tpu.ops.intersect import Hit
from raytracing_tests_tpu.scene.types import Scene

BIG_T = 3.0e38
DEAD_OD = 1.0e19  # o.d sentinel for zero-direction lanes: kills both roots
LANE = 128
DEFAULT_L = 2048  # ray lanes per grid block (measured best on v5e)
DEFAULT_GR = 128  # objects per culling group (sublane rows)
# Rows per surrounding-RI probe group (see _probe_tables).  Same-window
# A/Bs (round 3): 4 groups of 8 = 6.1 us/iter on the headline, one 32-row
# group = 8.3 on the VPU path, the round-2 64-row branched body = ~5.4;
# with the MXU containment dot (one (gr, 8) @ (8, L) per group) the
# per-group matmul count is what matters — env-overridable for tuning.
PROBE_GR = int(_os.environ.get("PROBE_GR", "8"))

# Object-table (Np, 128) column indices ("otab"): per-object sweep constants.
# The two K=3 triples (center, delta-position) sit at 8-ALIGNED offsets with
# zero columns padding them to K = 8, so the MXU contractions below slice the
# table exactly on f32 tile boundaries (see the MXU note above).
OT_CX, OT_CY, OT_CZ = 0, 1, 2  # columns 3..7 are zero
OT_DPX, OT_DPY, OT_DPZ = 8, 9, 10  # columns 11..15 are zero
OT_K1, OT_K2, OT_K3, OT_RI, OT_RINV2 = 16, 17, 18, 19, 20
OT_COLS = 128  # lane-padded

# Transposed fields table (F, Np) row indices ("ftab"): gathered per winner.
(
    FT_CX, FT_CY, FT_CZ, FT_RINV, FT_DPX, FT_DPY, FT_DPZ,
    FT_CR, FT_CG, FT_CB, FT_MRI, FT_REFR, FT_REFL, FT_SRFR, FT_SRFL,
    FT_TEX, FT_EMIS, FT_OBJ, FT_R2,
) = range(19)
FT_ROWS = 24  # sublane-padded (3 f32 tiles)

# Kernel hit-output (16, Bp) row indices.
(
    V_T, V_RI, V_NX, V_NY, V_NZ, V_CR, V_CG, V_CB, V_MRI,
    V_REFR, V_REFL, V_SRFR, V_SRFL, V_TEX, V_EMIS, V_OBJ,
) = range(16)
V_ROWS = 16


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Packing (host/trace side)
# ---------------------------------------------------------------------------


def pack_tables(scene: Scene, order, n_pad: int, anchor, valid_mask=None):
    """Morton-ordered scene -> (otab (Np, 128), ftab (FT_ROWS, Np)).

    ``order`` is the sorted->original permutation; invalid and padding rows
    get K1 = BIG (kills the quadratic AND the RI containment test).
    ``anchor`` is the (n_pad, 3) per-object GROUP center: the quadratic is
    expanded around it (c' = c - anchor), so the |c'|^2 - r^2 cancellation
    stays well-conditioned — Morton groups are spatially tight, and a huge
    isolated object anchors at ~its own center, recovering the v1 form.
    ``valid_mask`` (original-index space) additionally kills rows — used by
    the dielectric-only probe sub-table.
    """
    s = {f: getattr(scene, f)[order] for f in (
        "position", "scale", "delta_position", "color", "refractive_index",
        "refractivity", "reflectivity", "scatter_refract", "scatter_reflect",
        "texture_index", "emissive", "valid",
    )}
    if valid_mask is not None:
        s["valid"] = s["valid"] & valid_mask[order]
    n = order.shape[0]
    c = s["position"] - anchor[:n]  # group-relative centers
    r = s["scale"][:, 0]
    dp = s["delta_position"]
    valid = s["valid"]
    k1 = jnp.sum(c * c, axis=1) - r * r
    k1 = jnp.where(valid, k1, BIG_T)
    k2 = 2.0 * jnp.sum(c * dp, axis=1)
    k3 = jnp.sum(dp * dp, axis=1)

    # Invalid rows keep a tiny-but-nonzero rinv2 so the edge metric
    # (c_q - nb^2) * rinv2 stays huge (K1 = BIG) instead of collapsing to 0.
    rinv2 = jnp.where(valid, 1.0 / jnp.maximum(r * r, 1e-30), 1e-30)
    otab = jnp.zeros((n_pad, OT_COLS), jnp.float32)
    otab = otab.at[:n, OT_CX : OT_CZ + 1].set(c)
    otab = otab.at[:n, OT_DPX : OT_DPZ + 1].set(dp)
    body = jnp.stack([k1, k2, k3, s["refractive_index"], rinv2], axis=1)
    otab = otab.at[:n, OT_K1 : OT_RINV2 + 1].set(body)
    otab = otab.at[n:, OT_K1].set(BIG_T)  # padding rows are dead
    otab = otab.at[n:, OT_RINV2].set(1e-30)
    c = s["position"]  # ftab keeps ABSOLUTE centers (normal computation)

    rinv = jnp.where(valid, 1.0 / jnp.maximum(r, 1e-20), 0.0)
    frows = [
        c[:, 0], c[:, 1], c[:, 2], rinv, dp[:, 0], dp[:, 1], dp[:, 2],
        s["color"][:, 0], s["color"][:, 1], s["color"][:, 2],
        s["refractive_index"], s["refractivity"], s["reflectivity"],
        s["scatter_refract"], s["scatter_reflect"],
        s["texture_index"].astype(jnp.float32),
        s["emissive"].astype(jnp.float32),
        order.astype(jnp.float32),
        r * r,
    ]
    ftab = jnp.zeros((FT_ROWS, n_pad), jnp.float32)
    ftab = ftab.at[: len(frows), :n].set(jnp.stack(frows))
    return otab, ftab


def pack_ftab_splits(ftab):
    """f32 fields table -> 3-term bf16 decomposition (hi, mid, lo).

    hi + mid + lo reconstructs every f32 entry to full mantissa (8+8+8
    bits).  Because the winner gather's one-hot operand is EXACTLY
    bf16-representable, three single-pass (DEFAULT-precision) bf16 MXU
    matmuls against these splits give an exact gather at half the cost of
    the 6-pass f32 HIGHEST emulation (and Mosaic does not support HIGH
    in-kernel at all)."""
    # optimization_barrier: under --xla_allow_excess_precision (set by some
    # TPU runtimes) XLA's simplifier elides the f32->bf16->f32 round-trip
    # inside a traced graph, collapsing the residuals to 0 (mid = lo = 0)
    # and silently quantizing every gathered field to bf16.  The barrier
    # pins the rounding.  (Eager/op-by-op builds never fused the pair,
    # which is why only in-jit accel builds were affected.)
    hi = jax.lax.optimization_barrier(ftab.astype(jnp.bfloat16))
    r1 = ftab - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def pack_rays(o, d, time_ratio, t_limit, block: int):
    """(B, 3) x2 + (B,) x2 -> (8, Bp) ray matrix, lane-padded to ``block``."""
    B = o.shape[0]
    Bp = -(-B // block) * block
    rows = jnp.stack([
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        1.0 - time_ratio, t_limit,
    ])
    if Bp != B:
        rows = jnp.pad(rows, ((0, 0), (0, Bp - B)))
    return rows, B


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _slab_hit(gaabb_ref, g, ox, oy, oz, ix, iy, iz, t_best):
    """Group-AABB slab test on (1, L) planes -> (1, L) bool."""
    u1 = (gaabb_ref[g, 0] - ox) * ix
    w1 = (gaabb_ref[g, 3] - ox) * ix
    u2 = (gaabb_ref[g, 1] - oy) * iy
    w2 = (gaabb_ref[g, 4] - oy) * iy
    u3 = (gaabb_ref[g, 2] - oz) * iz
    w3 = (gaabb_ref[g, 5] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(u1, w1), jnp.minimum(u2, w2)),
                       jnp.minimum(u3, w3))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(u1, w1), jnp.maximum(u2, w2)),
                       jnp.maximum(u3, w3))
    return (tmax > tmin) & (tmax > 0.0) & (tmin < t_best)


def _point_in_aabb(gaabb_ref, g, qx, qy, qz):
    return ((qx >= gaabb_ref[g, 0]) & (qx <= gaabb_ref[g, 3])
            & (qy >= gaabb_ref[g, 1]) & (qy <= gaabb_ref[g, 4])
            & (qz >= gaabb_ref[g, 2]) & (qz <= gaabb_ref[g, 5]))


def _sweep_loop(otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz, omt, live,
                tlim, t_sc, obj_sc, m_sc, e_sc, *, n_groups, gr, has_motion,
                use_mxu, with_edge, cnt_ref=None, ablate=None, hot=0):
    """The grouped nearest-hit sweep writing best (t, obj[, edge]) into the
    scratch refs.  Shared by the sweep kernels and the megakernel.

    Fast path (``n_pad <= 1024`` and no edge output): t and the winner id
    are PACKED into one i32 ordering key — the low 10 mantissa bits of the
    (always-positive) t are replaced by the row id, so positive-float
    monotonicity makes a single integer min-reduction both the nearest-t
    and the argmin.  The ~6e-5-relative t quantization is repaired by the
    winner re-solve (``_winner_refine``), exactly like the group-anchor
    error."""
    dn = (((1,), (0,)), ((), ()))
    L = ox.shape[1]
    n_pad = n_groups * gr
    # Packed (t, id) key: id field sized to the table — 10 bits (6e-5
    # relative t quantization) up to 1023 rows, 11 bits (1.2e-4) up to
    # 2046; the winner re-solve repairs t either way.
    IDM = 1023 if n_pad < 1024 else 2047
    packed = (not with_edge) and n_pad < IDM
    eps = 1e-12
    if use_mxu:
        z5 = jnp.zeros((5, L), jnp.float32)
        dvec8 = jnp.concatenate([dx, dy, dz, z5], axis=0)  # (8, L)
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)

    limit0 = jnp.minimum(jnp.full((1, L), BIG_T, jnp.float32), tlim)
    if packed:
        # obj_sc carries the packed key during the loop; decoded at the end.
        obj_sc[:] = (
            jax.lax.bitcast_convert_type(limit0, jnp.int32) & ~IDM) | IDM
    else:
        t_sc[:] = limit0
        obj_sc[:] = jnp.full((1, L), -1, jnp.int32)
    if with_edge:
        m_sc[:] = jnp.full((1, L), BIG_T, jnp.float32)
        e_sc[:] = jnp.full((1, L), -1, jnp.int32)

    import os as _os
    if ablate is None:
        ablate = frozenset(_os.environ.get("UBER_ABLATE", "").split(","))
    _noslab = "noslab" in ablate
    # First ``hot`` groups run UNBRANCHED: near-first ordering means the
    # nearest groups are entered almost every iteration, so their branch
    # only costs (condition + control) without ever culling.
    hot = int(_os.environ.get("UBER_HOT", 0)) or hot
    # Groups per pl.when: a TAKEN branch costs ~2-4 us at L = 2048 (the
    # dominant per-group cost when most groups are entered anyway), so
    # spanning several groups under ONE branch (entered if ANY member's
    # slab passes) trades a little lost culling for fewer taken branches.
    _span = int(_os.environ.get("UBER_SPAN", "1"))

    for g0 in range(0, n_groups, _span):
        gset = range(g0, min(g0 + _span, n_groups))
        # live-mask: a block whose lanes are ALL dead (drained queue slots)
        # skips every group — the tail iterations of a lane-aligned drain
        # cost ~the slab tests alone.
        if packed:
            t_best_now = jax.lax.bitcast_convert_type(
                obj_sc[:] & ~IDM, jnp.float32)
        else:
            t_best_now = t_sc[:]
        ghit = jnp.zeros((1, L), jnp.bool_)
        for g in gset:
            ghit = ghit | _slab_hit(gaabb_ref, g, ox, oy, oz, ix, iy, iz,
                                    t_best_now)
        ghit = ghit & live

        def _body(g):
            if cnt_ref is not None:  # groups-entered diagnostic
                cnt_ref[3:4] = cnt_ref[3:4] + 1
            sl = slice(g * gr, (g + 1) * gr)
            k1 = otab_ref[sl, OT_K1 : OT_K1 + 1]  # (GR, 1)
            # Shift rays into the group-anchored frame.
            sx = ox - gaabb_ref[g, 6]
            sy = oy - gaabb_ref[g, 7]
            sz = oz - gaabb_ref[g, 8]
            od = sx * dx + sy * dy + sz * dz
            od = jnp.where(live, od, DEAD_OD)
            oo = sx * sx + sy * sy + sz * sz
            if use_mxu:
                C8 = otab_ref[sl, 0:8]  # (GR, 8): center cols + 5 zero cols
                ovec8 = jnp.concatenate([sx, sy, sz, z5], axis=0)
                DC = jax.lax.dot_general(
                    C8, dvec8, dn, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                OC = jax.lax.dot_general(
                    C8, ovec8, dn, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            else:
                cx = otab_ref[sl, OT_CX : OT_CX + 1]
                cy = otab_ref[sl, OT_CY : OT_CY + 1]
                cz = otab_ref[sl, OT_CZ : OT_CZ + 1]
                DC = cx * dx + cy * dy + cz * dz
                OC = cx * sx + cy * sy + cz * sz
            nb = DC - od  # = -half_b, (GR, L)
            c_q = oo + k1 - 2.0 * OC
            if has_motion:
                k2 = otab_ref[sl, OT_K2 : OT_K2 + 1]
                k3 = otab_ref[sl, OT_K3 : OT_K3 + 1]
                if use_mxu:
                    DP8 = otab_ref[sl, 8:16]  # dp cols + 5 zero cols
                    DDP = jax.lax.dot_general(
                        DP8, dvec8, dn, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    ODP = jax.lax.dot_general(
                        DP8, ovec8, dn, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                else:
                    dpx = otab_ref[sl, OT_DPX : OT_DPX + 1]
                    dpy = otab_ref[sl, OT_DPY : OT_DPY + 1]
                    dpz = otab_ref[sl, OT_DPZ : OT_DPZ + 1]
                    DDP = dpx * dx + dpy * dy + dpz * dz
                    ODP = dpx * sx + dpy * sy + dpz * sz
                nb = nb - omt * DDP
                c_q = c_q + omt * (2.0 * ODP - k2) + (omt * omt) * k3
            disc = nb * nb - c_q
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            tn = nb - sq  # near root (a == 1)
            tf = nb + sq
            t = jnp.where(tn > 0.0, tn, tf)
            pred = (disc > 0.0) & (t > 0.0)
            tc = jnp.where(pred, t, BIG_T)
            rid = g * gr + jax.lax.broadcasted_iota(jnp.int32, (gr, L), 0)
            if packed:
                ik = (jax.lax.bitcast_convert_type(tc, jnp.int32) & ~IDM) | rid
                gmin_i = jnp.min(ik, axis=0, keepdims=True)
                obj_sc[:] = jnp.minimum(obj_sc[:], gmin_i)
            else:
                gmin = jnp.min(tc, axis=0, keepdims=True)  # (1, L)
                gobj = jnp.min(
                    jnp.where(tc == gmin, rid, jnp.int32(0x7FFFFFFF)),
                    axis=0, keepdims=True)
                better = gmin < t_sc[:]
                t_sc[:] = jnp.where(better, gmin, t_sc[:])
                obj_sc[:] = jnp.where(better, gobj, obj_sc[:])
            if with_edge:
                # Silhouette-candidate metric (h/r)^2 - 1 where h is the
                # ray-line/center distance: (c_q - nb^2)*rinv2.
                rinv2 = otab_ref[sl, OT_RINV2 : OT_RINV2 + 1]
                fwd = nb > 0.0  # candidate must be in front
                me = jnp.where(fwd, (c_q - nb * nb) * rinv2, BIG_T)
                gm = jnp.min(me, axis=0, keepdims=True)
                ge = jnp.min(
                    jnp.where(me == gm, rid, jnp.int32(0x7FFFFFFF)),
                    axis=0, keepdims=True)
                be = gm < m_sc[:]
                m_sc[:] = jnp.where(be, gm, m_sc[:])
                e_sc[:] = jnp.where(be, ge, e_sc[:])

        def _bodies(gset=gset):
            for g in gset:
                _body(g)

        if _noslab or g0 + _span <= hot:
            _bodies()  # straight-line: no group branch
        else:
            pl.when(jnp.any(ghit))(_bodies)

    if packed:
        ik = obj_sc[:]
        rid_v = ik & IDM
        t_sc[:] = jax.lax.bitcast_convert_type(ik & ~IDM, jnp.float32)
        obj_sc[:] = jnp.where(rid_v == IDM, -1, rid_v)


def _gather_rows(ftab_ref, obj_best, n_pad, L):
    """One-hot winner gather on the MXU: ONE (3F, N) @ (N, L) pass.

    ``ftab_ref`` is the hi/mid/lo bf16 splits (``pack_ftab_splits``)
    STACKED on the sublane axis.  At F ~ 24-32 field rows 3F <= 128 still
    fits one MXU pass of rows, so the stacked gather costs about the same
    wall time as a single split while reconstructing full f32 mantissa
    (round 3: three separate M=24 matmuls measured ~2.6 us each in situ
    vs ~0.9 isolated — M-underutilization and per-invocation operand
    staging dominate at small M; stacking reclaims both).  Exact: each
    output element is a single product plus exact zeros per split, and
    the segments sum in the same (hi + mid) + lo order as before."""
    import os as _os
    _abl = frozenset(_os.environ.get("UBER_ABLATE", "").split(","))
    F = ftab_ref.shape[0] // 3
    dn = (((1,), (0,)), ((), ()))
    # The (n_pad, L) one-hot operand materializes in VMEM (bf16: 4.3 MB per
    # 1k rows at L = 2048) — chunk the contraction axis for big tables so
    # 10k-object scenes fit the scoped-VMEM budget.  Exact either way: each
    # chunk contributes a single product or exact zeros.
    CHUNK = 1024
    g3 = None
    for r0 in range(0, n_pad, CHUNK):
        rows = min(CHUNK, n_pad - r0)
        rid = r0 + jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)
        oh = (rid == obj_best).astype(jnp.bfloat16)
        if "gather1" in _abl:  # ablation: hi split only (8-bit mantissa)
            p = jax.lax.dot_general(ftab_ref[0:F, r0 : r0 + rows], oh, dn,
                                    preferred_element_type=jnp.float32)
        else:
            p = jax.lax.dot_general(ftab_ref[:, r0 : r0 + rows], oh, dn,
                                    preferred_element_type=jnp.float32)
        g3 = p if g3 is None else g3 + p
    if "gather1" in _abl:
        return g3
    return (g3[0:F] + g3[F : 2 * F]) + g3[2 * F : 3 * F]


def _winner_refine(rows, ox, oy, oz, dx, dy, dz, omt, t_best, hit, has_motion):
    """Re-solve the winner's quadratic DIRECTLY in its own frame
    (rel = o - c, v1's well-conditioned form) and derive the hit normal.
    The group-anchored sweep t carries up to ~7e-3 absolute error — bigger
    than the 1e-4 surface offset children spawn from, which produced
    spurious interior bounces (+13% rays, darker image).
    Returns (t_best, t_safe, px, py, pz, nx, ny, nz)."""
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
    hb = rex * dx + rey * dy + rez * dz
    cq = rex * rex + rey * rey + rez * rez - rows[FT_R2 : FT_R2 + 1]
    disc = hb * hb - cq
    sqw = jnp.sqrt(jnp.maximum(disc, 0.0))
    tn = -hb - sqw
    tf = -hb + sqw
    t_ref = jnp.where(tn > 0.0, tn, tf)
    ok = hit & (disc > 0.0) & (t_ref > 0.0)
    t_best = jnp.where(ok, t_ref, t_best)
    t_safe = jnp.where(hit, t_best, 1.0)
    px = ox + t_safe * dx
    py = oy + t_safe * dy
    pz = oz + t_safe * dz
    rinv = rows[FT_RINV : FT_RINV + 1]
    nx = (px - cex) * rinv
    ny = (py - cey) * rinv
    nz = (pz - cez) * rinv
    return t_best, t_safe, px, py, pz, nx, ny, nz


def _ri_probe(otab_ref, gaabb_ref, qx, qy, qz, omt, *, n_groups, gr,
              has_motion, use_mxu, need=None, g0=0, row0=0):
    """Surrounding-RI containment sum at probe point q; same quadratic
    expansion as the sweep (r^2 cancels: inside <=> qq + K1 - 2 C.q <= 0).

    Groups whose AABB contains no probe point in the block are skipped
    (member AABBs are subsets of the group AABB, so containment is
    impossible outside it) — the analogue of the sweep's slab culling.

    ``need`` ((1, L) bool, optional) marks the lanes whose shading actually
    consumes the result (dielectric winners / interior hits).  It is
    UNUSED for skipping: the probe runs STRAIGHT-LINE, branch-free.  A
    taken ``pl.when`` costs ~2-3.5 us at L = 2048 (measured round 3: the
    4-branch PROBE_GR restructure ran 3x slower than one 64-row body, and
    even ONE any(need) branch around the whole probe measured 4.1 us/iter
    where the branch fires most iterations), while the probe's ~32 rows of
    VPU containment cost ~1 us.  The per-PROBE_GR-row-group loop survives
    only for the group ANCHORS (``k1`` is anchor-relative for numerics);
    the accumulators are plain values, no scratch, no branch.

    ``g0``: first gaabb group row; ``row0``: first otab row of the probe
    sub-table.  ``make_accel2`` appends this DIELECTRIC-ONLY (ri != 1)
    sub-table after the main rows — only rows with ri != 1 can move the
    result off the neutral 1.0."""
    del need  # containment is exact; see docstring (no skip is profitable)
    dn = (((1,), (0,)), ((), ()))
    L = qx.shape[1]
    if use_mxu:
        z5 = jnp.zeros((5, L), jnp.float32)

    # Accumulate across groups in (gr, L) PLANES (every probe group is
    # PROBE_GR rows), reducing to (1, L) exactly ONCE at the end — the
    # per-group sum trees were half the probe's cost.
    acc8 = jnp.zeros((gr, L), jnp.float32)
    cnt8 = jnp.zeros((gr, L), jnp.float32)
    for g in range(g0, g0 + n_groups):
        r0 = row0 + (g - g0) * gr
        sl = slice(r0, r0 + gr)
        k1 = otab_ref[sl, OT_K1 : OT_K1 + 1]
        ri_col = otab_ref[sl, OT_RI : OT_RI + 1]
        ux = qx - gaabb_ref[g, 6]  # group-anchored probe point
        uy = qy - gaabb_ref[g, 7]
        uz = qz - gaabb_ref[g, 8]
        qq = ux * ux + uy * uy + uz * uz
        if use_mxu:
            C8 = otab_ref[sl, 0:8]
            qvec8 = jnp.concatenate([ux, uy, uz, z5], axis=0)
            QC = jax.lax.dot_general(
                C8, qvec8, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            QC = (otab_ref[sl, OT_CX : OT_CX + 1] * ux
                  + otab_ref[sl, OT_CY : OT_CY + 1] * uy
                  + otab_ref[sl, OT_CZ : OT_CZ + 1] * uz)
        lhs = qq + k1 - 2.0 * QC
        if has_motion:
            k2 = otab_ref[sl, OT_K2 : OT_K2 + 1]
            k3 = otab_ref[sl, OT_K3 : OT_K3 + 1]
            if use_mxu:
                DP8 = otab_ref[sl, 8:16]
                QDP = jax.lax.dot_general(
                    DP8, qvec8, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                QDP = (otab_ref[sl, OT_DPX : OT_DPX + 1] * ux
                       + otab_ref[sl, OT_DPY : OT_DPY + 1] * uy
                       + otab_ref[sl, OT_DPZ : OT_DPZ + 1] * uz)
            lhs = lhs + omt * (2.0 * QDP - k2) + (omt * omt) * k3
        inside = lhs <= 0.0
        acc8 = acc8 + jnp.where(inside, ri_col, 0.0)
        cnt8 = cnt8 + jnp.where(inside, 1.0, 0.0)
    acc = jnp.sum(acc8, axis=0, keepdims=True)
    cnt = jnp.sum(cnt8, axis=0, keepdims=True)
    return jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)


def _sweep2_kernel(n_pad: int, n_groups: int, gr: int, has_motion: bool,
                   with_ri: bool, with_fields: bool, use_mxu: bool,
                   with_edge: bool = False, n_pgroups: int = 0):
    """Kernel factory. Outputs: always (t, obj); ``with_fields`` adds the
    (V_ROWS, L) hit block (normal + material row + surrounding RI);
    ``with_edge`` adds the near-miss silhouette candidate
    argmin_i (perp_dist_i / r_i)^2 for the soft-edge gradient estimator."""

    def kernel(otab_ref, ftab_ref, gaabb_ref, rays_ref,
               t_out, obj_out, *maybe_out):
        rays = rays_ref[:]
        ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
        dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
        omt = rays[6:7]
        tlim = rays[7:8]
        a = dx * dx + dy * dy + dz * dz
        live = a > 0.5  # dead lanes carry d = 0 (unit dirs otherwise)
        L = ox.shape[1]

        def run(t_sc, obj_sc, m_sc=None, e_sc=None):
            _sweep_loop(
                otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz, omt, live,
                tlim, t_sc, obj_sc, m_sc, e_sc, n_groups=n_groups, gr=gr,
                has_motion=has_motion, use_mxu=use_mxu, with_edge=with_edge)

            t_best = t_sc[:]
            obj_best = obj_sc[:]
            hit = obj_best >= 0
            t_out[:] = jnp.where(hit, t_best, BIG_T)
            obj_out[:] = obj_best
            if with_edge:
                maybe_out[0][:] = e_sc[:]

            if not with_fields:
                return

            hit_out = maybe_out[1] if with_edge else maybe_out[0]
            rows = _gather_rows(ftab_ref, obj_best, n_pad, L)
            t_best, t_safe, px, py, pz, nx, ny, nz = _winner_refine(
                rows, ox, oy, oz, dx, dy, dz, omt, t_best, hit, has_motion)
            t_out[:] = jnp.where(hit, t_best, BIG_T)  # refined overwrite

            if with_ri:
                # Only dielectric winners / interior hits consume sur_ri
                # downstream (refraction eta) — restrict the probe's group
                # entry to those lanes; skipped lanes read the neutral 1.0.
                inner = (nx * dx + ny * dy + nz * dz) > 0.0
                need = hit & (inner | (rows[FT_REFR : FT_REFR + 1] > 0.002))
                sur_ri = _ri_probe(
                    otab_ref, gaabb_ref, px + 1e-3 * nx, py + 1e-3 * ny,
                    pz + 1e-3 * nz, omt,
                    n_groups=n_pgroups, gr=PROBE_GR,
                    has_motion=has_motion, use_mxu=True, need=need,
                    g0=n_groups, row0=n_pad)
            else:
                sur_ri = jnp.ones((1, L), jnp.float32)

            hit_out[:] = jnp.concatenate([
                jnp.where(hit, t_best, BIG_T), sur_ri, nx, ny, nz,
                rows[FT_CR : FT_CR + 1], rows[FT_CG : FT_CG + 1],
                rows[FT_CB : FT_CB + 1],
                rows[FT_MRI : FT_MRI + 1], rows[FT_REFR : FT_REFR + 1],
                rows[FT_REFL : FT_REFL + 1], rows[FT_SRFR : FT_SRFR + 1],
                rows[FT_SRFL : FT_SRFL + 1], rows[FT_TEX : FT_TEX + 1],
                rows[FT_EMIS : FT_EMIS + 1], rows[FT_OBJ : FT_OBJ + 1],
            ], axis=0)

        scoped = dict(
            t_sc=pltpu.VMEM((1, ox.shape[1]), jnp.float32),
            obj_sc=pltpu.VMEM((1, ox.shape[1]), jnp.int32),
        )
        if with_edge:
            scoped["m_sc"] = pltpu.VMEM((1, ox.shape[1]), jnp.float32)
            scoped["e_sc"] = pltpu.VMEM((1, ox.shape[1]), jnp.int32)
        pl.run_scoped(run, **scoped)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrapper + accel
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class Accel2:
    """v2 sphere-mode accel: Morton-grouped tables + group AABBs.

    ``otab``/``gaabb`` carry ``n_pgroups`` TRAILING dielectric-only probe
    groups (rows restricted to valid & ri != 1) after the main sweep
    groups — the surrounding-RI probe loops only over those.  ``ftab3``
    spans the MAIN rows only (its width is the winner-id space)."""

    def __init__(self, otab, ftab3, gaabb, perm, gr: int, has_motion: bool,
                 n_pgroups: int = 0):
        self.otab = otab  # (Np + Pp, 128)
        self.ftab3 = ftab3  # 3x (FT_ROWS, Np) bf16 hi/mid/lo splits
        self.gaabb = gaabb  # (G + PG, 128) rows: lo3 hi3 anchor3
        self.perm = perm  # (N,) sorted -> original
        self.gr = gr
        self.has_motion = has_motion
        self.n_pgroups = n_pgroups

    mode = "spheres"

    def tree_flatten(self):
        return (self.otab, self.ftab3, self.gaabb, self.perm), (
            self.gr, self.has_motion, self.n_pgroups)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def make_accel2(scene: Scene, gr: int = DEFAULT_GR,
                has_motion: bool = True, sort_origin=None,
                probe_rows=None, probe_mask=None) -> Accel2:
    """Morton-order objects into groups of ``gr``; huge objects isolated
    into leading always-tested groups (same policy as v1 ``make_accel``).

    ``sort_origin`` (e.g. the camera position) additionally orders the
    GROUPS near-to-far by closest-AABB-point distance — the block-culling
    analogue of the reference traversal's near-child-first heuristic
    (01_BVH glsl:455-460): a near group hit tightens every lane's t limit
    before the far groups' slab tests run, so far groups cull away.

    ``probe_rows``: static count of dielectric (ri != 1) rows, used to size
    the trailing probe sub-table (see ``Accel2``).  Defaults to counting on
    the concrete scene; REQUIRED when the scene is a tracer (pass
    ``cfg.probe_rows`` — ``RenderConfig.for_scene`` records it)."""
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
    glo = jnp.min(lo_s.reshape(-1, gr, 3), axis=1)  # (G, 3)
    ghi = jnp.max(hi_s.reshape(-1, gr, 3), axis=1)
    G = glo.shape[0]
    # Per-group quadratic anchor: MEDIAN of member centers, robust to a huge
    # outlier sharing the group (the ground sphere would otherwise drag an
    # AABB-center anchor ~its radius away from every small member, and the
    # |c'|^2 - r^2 cancellation would blow past the v1 kernel's error).
    cen = scene.position[order]
    v_s = valid[order]
    if n_pad != n:
        cen = jnp.concatenate([cen, jnp.zeros((n_pad - n, 3))])
        v_s = jnp.concatenate([v_s, jnp.zeros((n_pad - n,), bool)])
    cg = cen.reshape(G, gr, 3)
    vg = v_s.reshape(G, gr, 1)
    # Masked coordinate-wise median: dead rows sort to +inf and a dynamic
    # take picks the middle VALID element (a mostly-dead group must not
    # anchor at a padding value).
    cg_sorted = jnp.sort(jnp.where(vg, cg, jnp.inf), axis=1)
    nv = jnp.sum(vg.astype(jnp.int32), axis=1)  # (G, 1)
    mid = jnp.clip((nv - 1) // 2, 0, gr - 1)[:, None, :]  # (G, 1, 1)
    med = jnp.take_along_axis(cg_sorted, jnp.broadcast_to(mid, (G, 1, 3)),
                              axis=1)[:, 0]
    anchor_g = jnp.where(nv > 0, med, 0.0)
    gaabb = jnp.zeros((G, OT_COLS), jnp.float32)
    gaabb = gaabb.at[:, 0:3].set(glo).at[:, 3:6].set(ghi)
    gaabb = gaabb.at[:, 6:9].set(anchor_g)

    anchor = jnp.repeat(anchor_g, gr, axis=0)  # (n_pad, 3) per-object
    otab, ftab = pack_tables(scene, order, n_pad, anchor)

    perm = order
    if n_pad != n:
        perm = jnp.concatenate([perm, jnp.zeros((n_pad - n,), jnp.int32)])
    if sort_origin is not None:
        origin = jnp.asarray(sort_origin, jnp.float32)
        near = jnp.clip(origin, glo, ghi)  # closest AABB point per group
        d2 = jnp.sum((near - origin) ** 2, axis=1)  # empty groups -> inf
        gorder = jnp.argsort(d2)
        otab = otab.reshape(G, gr, OT_COLS)[gorder].reshape(n_pad, OT_COLS)
        ftab = ftab.reshape(FT_ROWS, G, gr)[:, gorder].reshape(FT_ROWS, n_pad)
        gaabb = gaabb[gorder]
        perm = perm.reshape(G, gr)[gorder].reshape(n_pad)

    def _pack_probe(o, npd, anc, vm, dm):
        tab = pack_tables(scene, o, npd, anc, vm)[0]
        return tab.at[:, OT_K1].set(
            jnp.where(dm, tab[:, OT_K1], jnp.float32(BIG_T)))

    potab, pgaabb = _probe_tables(
        scene, key, valid, lo, hi, gr, probe_rows, _pack_probe,
        probe_mask=probe_mask)
    otab = jnp.concatenate([otab, potab])
    gaabb = jnp.concatenate([gaabb, pgaabb])
    return Accel2(otab, pack_ftab_splits(ftab), gaabb, perm, gr, has_motion,
                  n_pgroups=pgaabb.shape[0])


# probe_relevant_rows cache: the O(N^2) host matrix (a ~200 MB transient
# at the N = 4096 threshold) must not be rebuilt on every render call.
# Keyed by id(scene.position), VALIDATED against the identity of EVERY
# array the computation reads (scene.replace(...) variants share the
# position array but change e.g. refractivity — a positional-only key
# returned stale masks).  The stored strong refs keep the keys alive, so
# matching ids PROVE identity.  Bounded FIFO — renders reuse a handful of
# scenes.
_PROBE_CACHE: dict = {}
_PROBE_CACHE_MAX = 8


def _probe_cache_deps(scene):
    """Every scene array ``probe_relevant_rows`` reads, directly or through
    ``scene_mode``/``world_aabbs``."""
    return (scene.position, scene.rotation, scene.scale,
            scene.delta_position, scene.obj_type, scene.valid,
            scene.refractive_index, scene.refractivity, scene.texture_index)


def probe_relevant_rows(scene, margin: float = 4e-3):
    """Boolean np mask of scene rows that can move the surrounding-RI probe
    off the neutral 1.0 — or ``None`` for traced scenes (keep everything).

    The probe's consumers are exactly the lanes whose winner spawns a
    refraction child: OUTER hits on refractive objects (refr > 0.002) and
    INNER hits (``need = hit & (inner | refr)`` in ``mega._shade_hits``;
    opaque outer winners never read ``sur_ri``).  The probe point sits
    1e-3 OUTSIDE the (convex) winner along the outward normal.  Interiors
    are REACHABLE through refraction, so inner-hit surfaces belong to
    refractive objects or to objects whose volume overlaps one (a ray can
    exit glass inside them — and spawn offsets can hop the ray across any
    further overlap in the chain, so hosts are the TRANSITIVE closure of
    the gap <= margin adjacency seeded at refractive rows).  Therefore a
    probe row B matters only if B (ri != 1) lies within ``margin`` (probe
    offset + spawn offset + slack) of the surface of some HOST A != B.
    The reference's accumulation traversal (01_BVH glsl:268-345) culls
    per-probe by AABB descent; this is the same cut made static.

    NOT bit-exact, honestly: reflect children spawn 1e-4 outside their
    winner, which can be 1e-4 INSIDE a NON-host opaque neighbor — an
    interior reached without refraction that this cut ignores (the
    closure covers the hop only when the neighbor chains back to a
    refractive row).  Measured on the headline scene: +41 rays of 92M
    (4.5e-7) and no change in the image mean — far inside the statistical
    envelope every cross-renderer comparison already accepts
    (PERFORMANCE.md fact 14).  ALSO ASSUMED: the camera starts in air —
    a camera placed inside a dielectric would probe interiors no
    refraction event reaches (use ``cfg.probe_rows = -1`` to keep the
    full table for such scenes).  Cut: 486 probe rows (61 straight-line
    groups) -> 40 rows (5 groups) on the headline scene, worth ~27% of
    the frame (54.0 -> 74.4 Mrays/s same-window).

    Sphere scenes use exact pairwise surface gaps (shrunk by both motion
    amplitudes — centers sweep [c - dp, c]); generic scenes use the
    conservative world-AABB gap.  Training keeps the full table (traced
    scenes return None): optimization can move objects into contact."""
    deps = _probe_cache_deps(scene)
    # Key on EVERY dep's id (not just position): scene.replace() variants
    # share the position array, and a single-slot-per-position key made
    # alternating variants evict each other every call (round-5 review).
    ck = tuple(map(id, deps)) + (margin,)
    hit_c = _PROBE_CACHE.get(ck)
    if (hit_c is not None
            and all(a is b for a, b in zip(hit_c[0], deps))):
        return hit_c[1]
    try:
        valid = np.asarray(scene.valid)
        dmask = valid & (np.asarray(scene.refractive_index) != 1.0)
        refr = valid & (np.asarray(scene.refractivity) > 0.002)
        n = valid.shape[0]
        if n > 4096:  # O(N^2) host check; stay conservative at 10k+
            mask = dmask
        elif not refr.any():
            mask = np.zeros_like(dmask)
        else:
            from raytracing_tests_tpu.kernels.sweep import scene_mode

            if scene_mode(scene) == "spheres":
                c = np.asarray(scene.position)
                r = np.asarray(scene.scale)[:, 0]
                amp = np.linalg.norm(np.asarray(scene.delta_position), axis=1)
                d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
                gap = (d - (r[:, None] + r[None, :])
                       - (amp[:, None] + amp[None, :]))
            else:
                lo, hi = scene.world_aabbs()  # already motion-swept
                lo = np.asarray(lo)
                hi = np.asarray(hi)
                sep = np.maximum(lo[:, None] - hi[None, :],
                                 lo[None, :] - hi[:, None])
                gap = sep.max(axis=-1)
            np.fill_diagonal(gap, np.inf)
            gap[~valid] = np.inf
            gap[:, ~valid] = np.inf
            touch = gap <= margin  # symmetric adjacency
            hosts = refr.copy()  # transitive closure over touch
            while True:
                grown = hosts | (valid & touch[:, hosts].any(axis=1))
                if (grown == hosts).all():
                    break
                hosts = grown
            near_host = touch[:, hosts].any(axis=1)
            mask = dmask & near_host
    except jax.errors.TracerArrayConversionError:
        return None
    if len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
        _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
    _PROBE_CACHE[ck] = (deps, mask)
    return mask


def _probe_tables(scene, key, valid, lo, hi, gr: int, probe_rows, packer,
                  probe_mask=None):
    """Dielectric-only (valid & ri != 1) probe sub-table: Morton/huge-first
    ordered rows grouped by ``gr`` = PROBE_GR with their own AABBs + median
    anchors.  Only ri != 1 rows can move the surrounding-RI result off the
    neutral 1.0, so the probe loops over this subset instead of the whole
    table — and the SMALL group size keeps each probe group's AABB tight
    around ~8 Morton-adjacent dielectrics, so most blocks' probe points
    enter no group at all (at the main sweep's gr the one wide group
    spanned the scene and fired nearly every iteration: 17% of the
    headline frame, measured round 3).  ``packer(order, n_pad, anchor,
    valid_mask)`` builds the mode-specific object table."""
    import numpy as np

    gr = PROBE_GR
    dmask = valid & (scene.refractive_index != 1.0)
    if probe_mask is not None:  # consumer-reachability cut (see
        dmask = dmask & jnp.asarray(probe_mask)  # probe_relevant_rows)
    if probe_rows is None or probe_rows < 0:
        probe_rows = int(np.asarray(dmask).sum())  # concrete scenes only
    if probe_rows == 0:
        # No probe consumers (or statically-skippable probe): zero groups —
        # the kernels fold the empty probe loop to the neutral 1.0.
        z = jnp.zeros((0, OT_COLS), jnp.float32)
        return z, z
    np_pad = max(gr, -(-probe_rows // gr) * gr)
    pkey = jnp.where(dmask, key, jnp.uint32(0xFFFFFFFF))
    porder = jnp.argsort(pkey).astype(jnp.int32)
    n = porder.shape[0]
    if np_pad > n:  # all-dielectric tiny scenes: repeat rows, masked dead
        porder = jnp.concatenate(
            [porder, jnp.zeros((np_pad - n,), jnp.int32)])
        live = jnp.arange(np_pad) < probe_rows
    else:
        porder = porder[:np_pad]
        live = jnp.arange(np_pad) < probe_rows
    dm = dmask[porder] & live

    INF = 3.0e38
    lo_p = jnp.where(dm[:, None], lo[porder], INF)
    hi_p = jnp.where(dm[:, None], hi[porder], -INF)
    PG = np_pad // gr
    plo = jnp.min(lo_p.reshape(PG, gr, 3), axis=1)
    phi = jnp.max(hi_p.reshape(PG, gr, 3), axis=1)
    cen = jnp.where(dm[:, None], scene.position[porder], jnp.inf)
    cg_sorted = jnp.sort(cen.reshape(PG, gr, 3), axis=1)
    nv = jnp.sum(dm.reshape(PG, gr, 1).astype(jnp.int32), axis=1)
    mid = jnp.clip((nv - 1) // 2, 0, gr - 1)[:, None, :]
    med = jnp.take_along_axis(cg_sorted, jnp.broadcast_to(mid, (PG, 1, 3)),
                              axis=1)[:, 0]
    anchor_g = jnp.where(nv > 0, med, 0.0)
    pgaabb = jnp.zeros((PG, OT_COLS), jnp.float32)
    pgaabb = pgaabb.at[:, 0:3].set(plo).at[:, 3:6].set(phi)
    pgaabb = pgaabb.at[:, 6:9].set(anchor_g)

    # packer(order, n_pad, anchor, valid_mask, dm) builds the mode-specific
    # table: valid_mask (ORIGINAL index space) kills the non-dielectric
    # argsort filler, and the POSITIONAL dm mask additionally kills
    # duplicated index-0 padding rows (np_pad > n) even when object 0 is
    # dielectric.
    anchor = jnp.repeat(anchor_g, gr, axis=0)
    potab = packer(porder, np_pad, anchor, dmask, dm)
    return potab, pgaabb


@functools.partial(
    jax.jit, static_argnames=("gr", "has_motion", "with_ri", "with_fields",
                              "use_mxu", "block", "with_edge"))
def _sweep2(otab, ftab3, gaabb, rays, B: int, gr: int, has_motion: bool,
            with_ri: bool, with_fields: bool, use_mxu: bool, block: int,
            with_edge: bool = False):
    fhi, fmid, flo = ftab3
    n_pad = fhi.shape[1]  # MAIN rows (ftab width = winner-id space)
    ftabS = jnp.concatenate([fhi, fmid, flo], axis=0)  # stacked gather
    n_groups = n_pad // gr
    n_pgroups = (otab.shape[0] - n_pad) // PROBE_GR  # trailing probe groups
    Bp = rays.shape[1]
    grid = (Bp // block,)
    lane_spec = lambda rows: pl.BlockSpec(
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        jax.ShapeDtypeStruct((1, Bp), jnp.int32),
    ]
    out_specs = [lane_spec(1), lane_spec(1)]
    if with_edge:
        out_shape.append(jax.ShapeDtypeStruct((1, Bp), jnp.int32))
        out_specs.append(lane_spec(1))
    if with_fields:
        out_shape.append(jax.ShapeDtypeStruct((V_ROWS, Bp), jnp.float32))
        out_specs.append(lane_spec(V_ROWS))
    return pl.pallas_call(
        _sweep2_kernel(n_pad, n_groups, gr, has_motion, with_ri, with_fields,
                       use_mxu, with_edge, n_pgroups=n_pgroups),
        grid=grid,
        in_specs=[full(otab), full(ftabS), full(gaabb), lane_spec(8)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(otab, ftabS, gaabb, rays)


def sweep2_nearest(accel: Accel2, o, d, time_ratio, t_limit,
                   use_mxu: bool = False, block: int = DEFAULT_L):
    """(t, obj_sorted) nearest-hit sweep (occlusion-grade, no fields)."""
    rays, B = pack_rays(o, d, time_ratio, t_limit, block)
    t, obj = _sweep2(accel.otab, accel.ftab3, accel.gaabb, rays, B, accel.gr,
                     accel.has_motion, False, False, use_mxu, block)
    return t[0, :B], obj[0, :B]


def sweep2_nearest_edge(accel: Accel2, o, d, time_ratio, t_limit,
                        use_mxu: bool = False, block: int = DEFAULT_L):
    """(t, obj_sorted, edge_sorted): adds the near-miss silhouette candidate
    (argmin perp/r over forward objects) for the soft-edge estimator."""
    rays, B = pack_rays(o, d, time_ratio, t_limit, block)
    t, obj, edge = _sweep2(
        accel.otab, accel.ftab3, accel.gaabb, rays, B, accel.gr,
        accel.has_motion, False, False, use_mxu, block, with_edge=True)
    return t[0, :B], obj[0, :B], edge[0, :B]


def sweep2_full(accel: Accel2, o, d, time_ratio, t_limit, with_ri: bool,
                use_mxu: bool = False, block: int = DEFAULT_L):
    """(t, obj_sorted, hit_rows (V_ROWS, B)) full sweep with in-kernel
    winner gather (+ surrounding-RI when ``with_ri``)."""
    rays, B = pack_rays(o, d, time_ratio, t_limit, block)
    t, obj, hit_rows = _sweep2(
        accel.otab, accel.ftab3, accel.gaabb, rays, B, accel.gr,
        accel.has_motion, with_ri, True, use_mxu, block)
    return t[0, :B], obj[0, :B], hit_rows[:, :B]


# ---------------------------------------------------------------------------
# intersect-module adapters (Hit / HitFields contract of kernels.sweep)
# ---------------------------------------------------------------------------


def _rows_to_hit(accel: Accel2, t, obj, rows):
    from raytracing_tests_tpu.kernels.sweep import HitFields

    hit = obj >= 0
    t_safe = jnp.where(hit, t, 1.0)
    normal = jnp.stack([rows[V_NX], rows[V_NY], rows[V_NZ]], axis=1)
    flds = HitFields(
        color=jnp.stack([rows[V_CR], rows[V_CG], rows[V_CB]], axis=1),
        refractive_index=rows[V_MRI],
        refractivity=rows[V_REFR],
        reflectivity=rows[V_REFL],
        scatter_refract=rows[V_SRFR],
        scatter_reflect=rows[V_SRFL],
        # round(): the HIGH-precision gather carries ~1e-4 absolute error,
        # which astype's truncation would turn into off-by-one ids.
        texture_index=jnp.round(rows[V_TEX]).astype(jnp.int32),
        emissive=rows[V_EMIS] > 0.5,
    )
    # local_pos == unit normal for isotropic spheres (p_rel / r).
    h = Hit(t=t_safe, obj=jnp.round(rows[V_OBJ]).astype(jnp.int32), hit=hit,
            normal=normal, local_pos=normal)
    return h, flds


def intersect2_fused(accel: Accel2, scene, o, d, time_ratio, t_limit):
    """(Hit, HitFields, surrounding_ri) — everything in one kernel."""
    t, obj, rows = sweep2_full(accel, o, d, time_ratio, t_limit, with_ri=True)
    h, flds = _rows_to_hit(accel, t, obj, rows)
    return h, flds, rows[V_RI]


def intersect2_full(accel: Accel2, scene, o, d, time_ratio, t_limit):
    """(Hit, HitFields) without the RI probe (non-dielectric scenes)."""
    t, obj, rows = sweep2_full(accel, o, d, time_ratio, t_limit, with_ri=False)
    return _rows_to_hit(accel, t, obj, rows)


def intersect2(accel: Accel2, scene, o, d, time_ratio, t_limit) -> Hit:
    return intersect2_full(accel, scene, o, d, time_ratio, t_limit)[0]


def occluded_nearest_obj2(accel: Accel2, scene, o, d, time_ratio, t_limit):
    """Original-id of the nearest hit (occlusion/shadow queries)."""
    _, obj = sweep2_nearest(accel, o, d, time_ratio, t_limit)
    return jnp.where(obj >= 0, accel.perm[jnp.maximum(obj, 0)], -1)
