"""Generic-mode (rotated ellipsoid/cuboid) grouped sweep for the persistent
megakernel.

``kernels/sweep2.py`` is the sphere-mode fast path: its MXU-formulated
quadratic and the packed-key reduction assume isotropic spheres.  This
module brings the SAME grouped block-culling architecture to the generic
primitive test (the reference flagship traversal's ``IntersectRay`` —
``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:212-266``: inverse
rotation into the local frame, then ellipsoid quadratic or cuboid slab by
object type), so the persistent kernel (``kernels/uber.py``) can drain
rotated-cuboid scenes (the INW-01 R-grid family) with the same
zero-scatter, ~100%-occupancy schedule as the headline sphere scene:

  - OBJECTS live on the sublane axis in Morton-sorted groups of ``gr`` rows
    (huge objects isolated first, groups ordered near-to-far from the
    camera); per group the frame transform and primitive tests run as
    (gr, 1) x (1, L) broadcast VPU ops.
  - The CANDIDATE stage runs the ORACLE's divide-by-scale arithmetic
    (``intersect_brute`` semantics: rotate by R^T, divide by scale) —
    bitwise-identical candidate t to the queue renderer, which the
    occlusion-grade consumers (shadow sweeps) need for visibility parity.
    A fused-frame M = diag(1/s) @ R^T reciprocal variant exists behind
    the ``fusedbody`` ablation: fewer ops on paper, measured ~34% SLOWER
    under Mosaic (bvh1k 179 vs 133 us/iter, round 3).  The packed (t, id)
    key quantizes t by the 11-bit id field; the one-hot-gathered winner is
    re-solved EXACTLY (``_winner_refine_g``), so only near-exact ties can
    flip the winner id (statistical parity — the same bargain as the
    sphere path's packed-key quantization, PERFORMANCE.md fact 11).
  - Per-group STATIC TYPE SPECIALIZATION: group kinds ('e'llipsoid /
    'c'uboid / 'm'ixed), censused at accel-build time from the concrete
    scene, skip the other primitive's test entirely for single-type groups
    (the huge-first policy isolates e.g. a ground box into its own
    cuboid-only group).
  - TWO-LEVEL CULLING: groups of ``gr`` rows under super-groups of 8
    Morton-adjacent groups with their union AABBs appended to the gaabb
    table — one super slab test skips 8 group slab tests, flattening the
    per-iteration overhead wall at 1k-10k objects.
  - Group-level AABB culling identical to the sphere path (``_slab_hit``)
    with per-lane t-limit tightening; near-to-far group order makes far
    groups die on the slab test (the reference's near-child-first
    heuristic, 01_BVH glsl:455-460, at group granularity).

Dielectric generic scenes are served too: ``_ri_probe_g`` runs the rotated
point-in-primitive containment sum (the surrounding-refractive-index
estimate) in the fused M-space, grouped and point-in-group-AABB-culled,
and ``sweep2g_nearest`` exposes the occlusion-grade sweep standalone for
the fast gradient path's detached winner-finding (``diff/fastpath.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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

# Generic object-table (Np, 128) column indices.  M is the fused frame
# matrix diag(1/scale) @ R^T (row-major): unit-primitive coords in one
# 9-FMA broadcast transform.
GO_PX, GO_PY, GO_PZ = 0, 1, 2
GO_DPX, GO_DPY, GO_DPZ = 3, 4, 5
(
    GO_M00, GO_M01, GO_M02, GO_M10, GO_M11, GO_M12, GO_M20, GO_M21, GO_M22,
) = range(6, 15)
GO_TYPE, GO_VALID, GO_RI = 15, 16, 17
# Raw rotation + scale copies (v1-body ablation: candidate arithmetic in
# the divide-by-scale form; see group_body's "v1body" branch).
GO_RR00 = 18  # .. GO_RR22 = 26 (row-major R)
GO_SX, GO_SY, GO_SZ = 27, 28, 29

SG = 8  # groups per super-group (two-level culling)

# Generic fields table: sweep2's FT_* material rows (0..18) + the winner
# geometry needed by the per-lane refine: rotation, scale, type.
GFT_R00 = 19  # .. GFT_R22 = 27 (row-major)
GFT_SX, GFT_SY, GFT_SZ = 28, 29, 30
GFT_TYPE = 31
GFT_ROWS = 32  # 4 f32 sublane tiles

_ELL = float(geometry.ELLIPSOID)


def pack_tables_g(scene: Scene, order, n_pad: int, valid_mask=None,
                  pos_live=None):
    """Morton-ordered scene -> (otab (Np, 128), ftab (GFT_ROWS, Np)).
    ``valid_mask`` (original-index space) additionally kills rows — used by
    the dielectric-only probe sub-table.  ``pos_live`` (POSITIONAL, length
    of ``order``) kills the dead padding rows the type-pure grouping
    inserts mid-table (duplicated index-0 fillers)."""
    s = {f: getattr(scene, f)[order] for f in (
        "position", "rotation", "scale", "delta_position", "obj_type",
        "color", "refractive_index", "refractivity", "reflectivity",
        "scatter_refract", "scatter_reflect", "texture_index", "emissive",
        "valid",
    )}
    if valid_mask is not None:
        s["valid"] = s["valid"] & valid_mask[order]
    if pos_live is not None:
        s["valid"] = s["valid"] & jnp.asarray(pos_live)
    n = order.shape[0]
    c = s["position"]
    dp = s["delta_position"]
    R = s["rotation"]
    sc = s["scale"]
    valid = s["valid"]

    # Fused frame M = diag(1/s) @ R^T: M[i][j] = R[j][i] / s_i.  Padding /
    # invalid rows carry zero scale — guard to keep the table finite (their
    # candidates are valid-masked to BIG downstream).
    s_safe = jnp.where(sc > 0.0, sc, 1.0)
    M = jnp.transpose(R, (0, 2, 1)) / s_safe[:, :, None]
    otab = jnp.zeros((n_pad, OT_COLS), jnp.float32)
    otab = otab.at[:n, GO_PX : GO_PZ + 1].set(c)
    otab = otab.at[:n, GO_DPX : GO_DPZ + 1].set(dp)
    otab = otab.at[:n, GO_M00 : GO_M22 + 1].set(M.reshape(n, 9))
    otab = otab.at[:n, GO_TYPE].set(s["obj_type"].astype(jnp.float32))
    otab = otab.at[:n, GO_VALID].set(valid.astype(jnp.float32))
    otab = otab.at[:n, GO_RI].set(s["refractive_index"])
    otab = otab.at[:n, GO_RR00 : GO_RR00 + 9].set(R.reshape(n, 9))
    otab = otab.at[:n, GO_SX : GO_SZ + 1].set(jnp.where(sc > 0, sc, 1.0))

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
    """Generic-mode accel: Morton-grouped fused-frame tables + group AABBs.
    Like ``sweep2.Accel2``, ``otab``/``gaabb`` carry ``n_pgroups`` trailing
    dielectric-only probe groups; ``ftab3`` spans the main rows only.
    ``gaabb`` additionally carries ``n_sgroups`` SUPER-GROUP union-AABB rows
    after the probe rows; ``gkinds`` is the static per-group type census
    ('e'/'c'/'m', None when built from a traced scene)."""

    def __init__(self, otab, ftab3, gaabb, perm, gr: int, has_motion: bool,
                 n_pgroups: int = 0, n_sgroups: int = 0, gkinds=None):
        self.otab = otab  # (Np + Pp, 128)
        self.ftab3 = ftab3  # 3x (GFT_ROWS, Np) bf16 hi/mid/lo splits
        self.gaabb = gaabb  # (G + PG + SGn, 128) rows: lo3 hi3
        self.perm = perm
        self.gr = gr
        self.has_motion = has_motion
        self.n_pgroups = n_pgroups
        self.n_sgroups = n_sgroups
        self.gkinds = gkinds

    mode = "generic"

    def tree_flatten(self):
        return (self.otab, self.ftab3, self.gaabb, self.perm), (
            self.gr, self.has_motion, self.n_pgroups, self.n_sgroups,
            self.gkinds)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)


def make_accel2g(scene: Scene, gr: int = 64, has_motion: bool = True,
                 sort_origin=None, probe_rows=None,
                 probe_mask=None) -> Accel2G:
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
    # TYPE-PURE grouping: chunk each primitive CLASS (ellipsoid / cuboid)
    # into groups of ``gr`` along its own Morton order — EVERY group is
    # single-type (the census below picks the cheap specialized body).
    # Partial tails stay pure on purpose: merging the two tails into one
    # mixed group was A/B'd on the lights scene and LOST (16.7 vs 18.6+
    # Mrays/s) — the mixed body runs BOTH primitives' arithmetic over
    # all gr rows, which costs more than an extra pure body + branch.
    # Members stay Morton-ADJACENT within their class, so group AABBs
    # keep near-mixed tightness.  The round-3
    # GLOBAL (huge, type, morton) key lost that tightness on alternating
    # scenes: a checkerboard grid's 64 same-type Morton neighbours span
    # ~128 cells, doubling every group AABB (measured 13.2/17 groups
    # entered per iteration on bvh1k).  Huge objects go LAST within their
    # class so they land in the tail group (a world-size AABB must not
    # make a full regular group always-entered).  UBER_TPACK=global
    # restores the round-3 key; =none disables type packing; traced
    # scenes fall back to plain Morton (their census is None — mixed
    # bodies — so packing is moot).
    import os as _os1
    tpack = _os1.environ.get("UBER_TPACK", "pure")
    cub = (scene.obj_type != geometry.ELLIPSOID) & valid & ~huge
    key = jnp.where(huge, jnp.uint32(0), codes + jnp.uint32(1))
    if tpack == "global":
        key = key + jnp.where(cub, jnp.uint32(0x40000000), jnp.uint32(0))
    key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key).astype(jnp.int32)

    n = scene.capacity
    pos_live = None
    if tpack == "pure":
        try:
            morder = np.asarray(order)
            v_np = np.asarray(valid)
            h_np = np.asarray(huge)
            c_np = np.asarray(cub)
            # Class by RAW type (``cub`` excludes huge rows, but a huge box
            # must still ride the cuboid class for a pure census).
            isc_np = np.asarray(
                (scene.obj_type != geometry.ELLIPSOID)) & v_np
            groups = []
            cls = {(False, False): [], (False, True): [],
                   (True, False): [], (True, True): []}
            for i in morder:
                i = int(i)
                if v_np[i]:
                    cls[bool(isc_np[i]), bool(h_np[i])].append(i)
            for is_cub in (False, True):
                cl = cls[is_cub, False] + cls[is_cub, True]  # huge last
                for k0 in range(0, len(cl), gr):
                    groups.append(cl[k0 : k0 + gr])
            if not groups:  # degenerate all-invalid scene
                groups = [[0]]
            rows, lv = [], []
            for gm in groups:
                rows += gm + [0] * (gr - len(gm))
                lv += [True] * len(gm) + [False] * (gr - len(gm))
            order = jnp.asarray(np.array(rows, np.int32))
            pos_live = np.array(lv, bool)
        except jax.errors.TracerArrayConversionError:
            pos_live = None  # traced: plain Morton grouping
    n_pad = order.shape[0] if pos_live is not None else -(-n // gr) * gr

    INF = 3.0e38
    vord = valid[order]
    if pos_live is not None:
        vord = vord & jnp.asarray(pos_live)
    lo_s = jnp.where(vord[:, None], lo[order], INF)
    hi_s = jnp.where(vord[:, None], hi[order], -INF)
    if n_pad != order.shape[0]:
        lo_s = jnp.concatenate(
            [lo_s, jnp.full((n_pad - order.shape[0], 3), INF)])
        hi_s = jnp.concatenate(
            [hi_s, jnp.full((n_pad - order.shape[0], 3), -INF)])
    glo = jnp.min(lo_s.reshape(-1, gr, 3), axis=1)
    ghi = jnp.max(hi_s.reshape(-1, gr, 3), axis=1)
    G = glo.shape[0]
    gaabb = jnp.zeros((G, OT_COLS), jnp.float32)
    gaabb = gaabb.at[:, 0:3].set(glo).at[:, 3:6].set(ghi)

    otab, ftab = pack_tables_g(scene, order, n_pad, pos_live=pos_live)

    perm = order
    if n_pad != order.shape[0]:
        perm = jnp.concatenate(
            [perm, jnp.zeros((n_pad - order.shape[0],), jnp.int32)])
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
        scene, key, valid, lo, hi, gr, probe_rows, _pack_probe,
        probe_mask=probe_mask)
    otab = jnp.concatenate([otab, potab])
    gaabb = jnp.concatenate([gaabb, pgaabb])

    # Static per-group type census (concrete scenes only — the uber path
    # builds eagerly; traced builds fall back to mixed bodies everywhere).
    gkinds = None
    try:
        typ = np.asarray(otab[: G * gr, GO_TYPE]).reshape(G, gr)
        vld = np.asarray(otab[: G * gr, GO_VALID]).reshape(G, gr) > 0
        # 's' sub-kind: every valid row an ISOTROPIC ellipsoid (a plain
        # sphere) — the body then runs the world-frame quadratic with no
        # rotation loads and no divisions.  Rotation is irrelevant to the
        # intersection of an isotropic sphere (it only affects the texture
        # frame, which the winner refine reads from the ftab rotation), so
        # rotated isotropic spheres qualify too.
        sc3 = np.asarray(otab[: G * gr, GO_SX : GO_SZ + 1]).reshape(G, gr, 3)
        iso = (sc3[..., 0] == sc3[..., 1]) & (sc3[..., 0] == sc3[..., 2])
        # Cuboid sub-kinds from the rotation STRUCTURE: 'a' = identity
        # rotation (slab straight on the relative frame — no rotation
        # loads/FMAs at all), 'cy' = rotation about y only (4 matrix
        # entries instead of 9).  Both match the mixed body bit-for-bit
        # up to the sign of exact zeros: the skipped terms multiply exact
        # 0.0/1.0 entries (x*1.0 == x; x + 0.0*y == x for every finite
        # nonzero x, and a -0.0/+0.0 flip only moves degenerate
        # axis-parallel slab candidates between +-inf, which min/max
        # ordering absorbs).
        rot = np.asarray(
            otab[: G * gr, GO_RR00 : GO_RR00 + 9]).reshape(G, gr, 9)
        ident = (rot == np.eye(3, dtype=np.float32).reshape(9)).all(axis=-1)
        yrot = ((rot[..., 1] == 0) & (rot[..., 3] == 0) & (rot[..., 4] == 1)
                & (rot[..., 5] == 0) & (rot[..., 7] == 0))
        kinds = []
        for g in range(G):
            v = vld[g]
            t = typ[g][v]
            has_e = bool((t == _ELL).any())
            has_c = bool((t != _ELL).any())
            if has_e and not has_c and bool(iso[g][v].all()):
                kinds.append("s")
            elif has_c and not has_e and bool(ident[g][v].all()):
                kinds.append("a")
            elif has_c and not has_e and bool(yrot[g][v].all()):
                kinds.append("cy")
            else:
                kinds.append("m" if (has_e and has_c) else
                             ("c" if has_c else "e"))
        gkinds = tuple(kinds)
    except jax.errors.TracerArrayConversionError:
        pass

    # Super-group union AABBs (two-level culling), appended after the probe
    # rows; only formed when there are enough groups to be worth a level.
    n_sgroups = 0
    if G > SG:
        n_sgroups = -(-G // SG)
        pad = n_sgroups * SG - G
        glo_f = gaabb[:G, 0:3]  # FINAL (near-to-far-reordered) group boxes
        ghi_f = gaabb[:G, 3:6]
        glo_p = jnp.concatenate([glo_f, jnp.full((pad, 3), INF)]) if pad else glo_f
        ghi_p = jnp.concatenate([ghi_f, jnp.full((pad, 3), -INF)]) if pad else ghi_f
        slo = jnp.min(glo_p.reshape(n_sgroups, SG, 3), axis=1)
        shi = jnp.max(ghi_p.reshape(n_sgroups, SG, 3), axis=1)
        sga = jnp.zeros((n_sgroups, OT_COLS), jnp.float32)
        sga = sga.at[:, 0:3].set(slo).at[:, 3:6].set(shi)
        gaabb = jnp.concatenate([gaabb, sga])

    return Accel2G(otab, pack_ftab_splits(ftab), gaabb, perm, gr, has_motion,
                   n_pgroups=pgaabb.shape[0], n_sgroups=n_sgroups,
                   gkinds=gkinds)


def _fused_frame(otab_ref, sl, ox, oy, oz, dx, dy, dz, omt, has_motion):
    """Shift rays object-relative and apply the fused M = diag(1/s) @ R^T:
    (gr, 1) columns against (1, L) planes -> (gr, L) unit-space
    origin/direction (ellipsoid = unit sphere, cuboid = unit cube)."""
    rx = ox - otab_ref[sl, GO_PX : GO_PX + 1]
    ry = oy - otab_ref[sl, GO_PY : GO_PY + 1]
    rz = oz - otab_ref[sl, GO_PZ : GO_PZ + 1]
    if has_motion:
        rx = rx + omt * otab_ref[sl, GO_DPX : GO_DPX + 1]
        ry = ry + omt * otab_ref[sl, GO_DPY : GO_DPY + 1]
        rz = rz + omt * otab_ref[sl, GO_DPZ : GO_DPZ + 1]
    m = [otab_ref[sl, GO_M00 + i : GO_M00 + i + 1] for i in range(9)]
    ex = m[0] * rx + m[1] * ry + m[2] * rz
    ey = m[3] * rx + m[4] * ry + m[5] * rz
    ez = m[6] * rx + m[7] * ry + m[8] * rz
    fx = m[0] * dx + m[1] * dy + m[2] * dz
    fy = m[3] * dx + m[4] * dy + m[5] * dz
    fz = m[6] * dx + m[7] * dy + m[8] * dz
    return ex, ey, ez, fx, fy, fz


def _ell_t_div(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz):
    """Ellipsoid t in the ORACLE's divide-by-scale arithmetic
    (``intersect_brute`` per-object semantics) — bitwise-identical
    candidate t to the queue renderer (shadow-visibility parity), and
    measured FASTER under Mosaic than the fused reciprocal form (see the
    ``fusedbody`` ablation).  Zero-scale rows produce NaN; consumers
    select-guard."""
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
    return jnp.where(ok & (t_e > 0.0), t_e, BIG_T)


def _cub_t_div(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz):
    """Cuboid slab t in the oracle's arithmetic (safe-inverse convention
    of ``geometry.ray_cuboid_t``, local rotated space, +-0.5*scale)."""
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
    return jnp.where(t_c > 0.0, t_c, BIG_T)


def _cub_t_inf(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz):
    """Cuboid slab t with a BARE reciprocal — bitwise-identical to
    ``_cub_t_div`` on every lane with |ld| >= 1e-12 per axis (1/ld is the
    same bits once ld_safe == ld), and IEEE-cleaner below it: 1/0 = +-inf
    gives the exact parallel-ray slab semantics ([-inf, inf] inside the
    slab, empty outside) where the eps-clamp manufactured +-1e12 phantom
    bounds.  The only loss: an origin EXACTLY on a slab plane of a
    parallel ray (0 * inf = NaN) reports miss — measure-zero, and the
    NaN propagates to ``tmax > tmin`` = False, never into the image.
    Saves the abs/compare/select per axis (~20% of a censused cuboid
    body); ``UBER_ABLATE=safeinv`` restores the clamped form for A/B."""

    def axis(lo, ld, s):
        inv = 1.0 / ld
        u = (-0.5 * s - lo) * inv
        w = (0.5 * s - lo) * inv
        return jnp.minimum(u, w), jnp.maximum(u, w)

    n1, x1 = axis(lox, ldx, sx)
    n2, x2 = axis(loy, ldy, sy)
    n3, x3 = axis(loz, ldz, sz)
    tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
    tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
    t_c = jnp.where(tmax > tmin, jnp.where(tmin > 0.0, tmin, tmax), BIG_T)
    return jnp.where(t_c > 0.0, t_c, BIG_T)


def _both_t_exact(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz):
    """Ellipsoid AND cuboid t, oracle arithmetic (see the two halves)."""
    return (_ell_t_div(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz),
            _cub_t_div(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz))


def _ell_t(ex, ey, ez, fx, fy, fz):
    """Unit-sphere candidate t on (gr, L) tiles (dead rays with d = 0
    produce a = 0 -> rejected).  One reciprocal instead of v1's two
    divisions — candidate-only arithmetic (see module docstring)."""
    a = fx * fx + fy * fy + fz * fz
    half_b = ex * fx + ey * fy + ez * fz
    c = ex * ex + ey * ey + ez * ez - 1.0
    disc = half_b * half_b - a * c
    ok = (disc > 0.0) & (a > 1e-30)
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    ra = 1.0 / jnp.where(ok, a, 1.0)
    t0 = (-half_b - sq) * ra
    t1 = (-half_b + sq) * ra
    t_e = jnp.where((t0 > t1) | (t0 < 0.0), t1, t0)
    return jnp.where(ok & (t_e > 0.0), t_e, BIG_T)


def _cub_t(ex, ey, ez, fx, fy, fz):
    """Unit-cube (+-0.5) slab candidate t on (gr, L) tiles (safe-inverse
    convention of ``geometry.ray_cuboid_t``, in fused unit space)."""
    eps = 1e-12

    def axis(lo, ld):
        ld_safe = jnp.where(jnp.abs(ld) < eps,
                            jnp.where(ld >= 0.0, eps, -eps), ld)
        inv = 1.0 / ld_safe
        u = (-0.5 - lo) * inv
        w = (0.5 - lo) * inv
        return jnp.minimum(u, w), jnp.maximum(u, w)

    n1, x1 = axis(ex, fx)
    n2, x2 = axis(ey, fy)
    n3, x3 = axis(ez, fz)
    tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
    tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
    t_c = jnp.where(tmax > tmin, jnp.where(tmin > 0.0, tmin, tmax), BIG_T)
    return jnp.where(t_c > 0.0, t_c, BIG_T)


def _sweep_loop_g(otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz, omt, live,
                  tlim, t_sc, obj_sc, m_sc=None, e_sc=None, *, n_groups, gr,
                  has_motion, cnt_ref=None, gkinds=None, n_sgroups=0, sg0=0,
                  with_edge=False):
    """Grouped nearest-hit sweep over the generic table, writing best
    (t, obj) into the scratch refs.  Structure mirrors
    ``sweep2._sweep_loop`` (slab-culled groups, live-mask block skip) plus
    the module-docstring upgrades: super-group pre-cull (``n_sgroups``
    union AABBs at gaabb rows [sg0, sg0+n_sgroups)), static per-group type
    specialization (``gkinds``), and the packed (t, id) single-reduction
    key (11-bit id space; generic tables up to 2047 rows)."""
    L = ox.shape[1]
    eps = 1e-12
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)

    import os as _os0
    n_pad = n_groups * gr
    IDM = 2047  # 11-bit id field (id == IDM means "none")
    packed = (not with_edge) and n_pad < IDM
    if "nopack" in frozenset(_os0.environ.get("UBER_ABLATE", "").split(",")):
        packed = False

    limit0 = jnp.minimum(jnp.full((1, L), BIG_T, jnp.float32), tlim)
    if with_edge:
        m_sc[:] = jnp.full((1, L), BIG_T, jnp.float32)
        e_sc[:] = jnp.full((1, L), -1, jnp.int32)
    if packed:
        obj_sc[:] = (
            jax.lax.bitcast_convert_type(limit0, jnp.int32) & ~IDM) | IDM
    else:
        t_sc[:] = limit0
        obj_sc[:] = jnp.full((1, L), -1, jnp.int32)

    def t_best_now():
        if packed:
            return jax.lax.bitcast_convert_type(obj_sc[:] & ~IDM,
                                                jnp.float32)
        return t_sc[:]

    def group_body(g):
        if cnt_ref is not None:  # groups-entered diagnostic
            cnt_ref[3:4] = cnt_ref[3:4] + 1
        sl = slice(g * gr, (g + 1) * gr)
        valid_col = otab_ref[sl, GO_VALID : GO_VALID + 1] > 0.0
        kind = gkinds[g] if gkinds is not None else "m"
        if "fusedbody" in _abl and not with_edge:
            # Ablation: the round-3a fused-frame candidate (M = diag(1/s)
            # R^T, reciprocal arithmetic).  Fewer ops on paper, measured
            # ~34% SLOWER under Mosaic than the divide-by-scale form below
            # (bvh1k 179 vs 133 us/iter, round 3) — kept for remeasurement.
            ex, ey, ez, fx, fy, fz = _fused_frame(
                otab_ref, sl, ox, oy, oz, dx, dy, dz, omt, has_motion)
            if kind == "e":
                tc = _ell_t(ex, ey, ez, fx, fy, fz)
            elif kind == "c":
                tc = _cub_t(ex, ey, ez, fx, fy, fz)
            else:
                typ = otab_ref[sl, GO_TYPE : GO_TYPE + 1]
                tc = jnp.where(typ == _ELL,
                               _ell_t(ex, ey, ez, fx, fy, fz),
                               _cub_t(ex, ey, ez, fx, fy, fz))
        else:
            # Default candidate: the ORACLE's divide-by-scale arithmetic
            # (intersect_brute semantics) — bitwise-identical candidate t
            # to the queue renderer (shadow-visibility parity), and faster
            # under Mosaic than the fused form (see ablation above).
            rx = ox - otab_ref[sl, GO_PX : GO_PX + 1]
            ry = oy - otab_ref[sl, GO_PY : GO_PY + 1]
            rz = oz - otab_ref[sl, GO_PZ : GO_PZ + 1]
            if has_motion:
                rx = rx + omt * otab_ref[sl, GO_DPX : GO_DPX + 1]
                ry = ry + omt * otab_ref[sl, GO_DPY : GO_DPY + 1]
                rz = rz + omt * otab_ref[sl, GO_DPZ : GO_DPZ + 1]
            if kind == "s" and not with_edge:
                # Isotropic unrotated spheres (censused at build time):
                # plain world-frame quadratic — no rotation loads, no
                # divisions (~1/3 the mixed body).  Unit directions make
                # a = 1; mathematically the oracle's t, and the winner is
                # re-solved in the oracle's exact arithmetic downstream
                # (_winner_refine_g), so only near-exact ties can flip —
                # the packed-key bargain already accepted everywhere.
                rr = otab_ref[sl, GO_SX : GO_SX + 1]
                hb = rx * dx + ry * dy + rz * dz
                cq = rx * rx + ry * ry + rz * rz - rr * rr
                disc = hb * hb - cq
                ok = disc > 0.0
                sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
                t0 = -hb - sq
                t1 = -hb + sq
                t_e = jnp.where(t0 < 0.0, t1, t0)
                tc = jnp.where(ok & (t_e > 0.0), t_e, BIG_T)
                # live mask: a dead lane (d = 0) whose stale origin sits
                # inside a sphere would yield disc = -cq > 0 and t1 > 0 —
                # a phantom hit the sibling paths' a > 1e-30 guards reject.
                tc = jnp.where(valid_col & live, tc, BIG_T)
                rid = g * gr + jax.lax.broadcasted_iota(
                    jnp.int32, (gr, L), 0)
                if packed:
                    ik = ((jax.lax.bitcast_convert_type(tc, jnp.int32)
                           & ~IDM) | rid)
                    gmin_i = jnp.min(ik, axis=0, keepdims=True)
                    obj_sc[:] = jnp.minimum(obj_sc[:], gmin_i)
                else:
                    gmin = jnp.min(tc, axis=0, keepdims=True)
                    gobj = jnp.min(
                        jnp.where(tc == gmin, rid, jnp.int32(0x7FFFFFFF)),
                        axis=0, keepdims=True)
                    better = gmin < t_sc[:]
                    t_sc[:] = jnp.where(better, gmin, t_sc[:])
                    obj_sc[:] = jnp.where(better, gobj, obj_sc[:])
                return
            sx = otab_ref[sl, GO_SX : GO_SX + 1]
            sy = otab_ref[sl, GO_SY : GO_SY + 1]
            sz = otab_ref[sl, GO_SZ : GO_SZ + 1]
            _cub_t_k = _cub_t_div if "safeinv" in _abl else _cub_t_inf
            if kind in ("a", "cy") and not with_edge:
                # Rotation-structure cuboid fast paths (censused): 'a'
                # slabs straight on the relative frame; 'cy' applies the
                # 4 live entries of a y-rotation.  Bitwise-identical to
                # the full transform (the skipped terms multiply exact
                # zeros/ones — see the census comment).
                if kind == "a":
                    tc = _cub_t_k(rx, ry, rz, dx, dy, dz, sx, sy, sz)
                else:
                    r0 = otab_ref[sl, GO_RR00 + 0 : GO_RR00 + 1]
                    r2 = otab_ref[sl, GO_RR00 + 2 : GO_RR00 + 3]
                    r6 = otab_ref[sl, GO_RR00 + 6 : GO_RR00 + 7]
                    r8 = otab_ref[sl, GO_RR00 + 8 : GO_RR00 + 9]
                    tc = _cub_t_k(r0 * rx + r6 * rz, ry,
                                  r2 * rx + r8 * rz,
                                  r0 * dx + r6 * dz, dy,
                                  r2 * dx + r8 * dz, sx, sy, sz)
                tc = jnp.where(valid_col & live, tc, BIG_T)
                rid = g * gr + jax.lax.broadcasted_iota(
                    jnp.int32, (gr, L), 0)
                if packed:
                    ik = ((jax.lax.bitcast_convert_type(tc, jnp.int32)
                           & ~IDM) | rid)
                    gmin_i = jnp.min(ik, axis=0, keepdims=True)
                    obj_sc[:] = jnp.minimum(obj_sc[:], gmin_i)
                else:
                    gmin = jnp.min(tc, axis=0, keepdims=True)
                    gobj = jnp.min(
                        jnp.where(tc == gmin, rid, jnp.int32(0x7FFFFFFF)),
                        axis=0, keepdims=True)
                    better = gmin < t_sc[:]
                    t_sc[:] = jnp.where(better, gmin, t_sc[:])
                    obj_sc[:] = jnp.where(better, gobj, obj_sc[:])
                return
            r = [otab_ref[sl, GO_RR00 + i : GO_RR00 + i + 1]
                 for i in range(9)]
            lox = r[0] * rx + r[3] * ry + r[6] * rz
            loy = r[1] * rx + r[4] * ry + r[7] * rz
            loz = r[2] * rx + r[5] * ry + r[8] * rz
            ldx = r[0] * dx + r[3] * dy + r[6] * dz
            ldy = r[1] * dx + r[4] * dy + r[7] * dz
            ldz = r[2] * dx + r[5] * dy + r[8] * dz
            if kind == "e" and not with_edge:
                tc = _ell_t_div(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz)
            elif kind == "c" and not with_edge:
                tc = _cub_t_k(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz)
            else:
                t_e, t_c = _both_t_exact(
                    lox, loy, loz, ldx, ldy, ldz, sx, sy, sz)
                typ = otab_ref[sl, GO_TYPE : GO_TYPE + 1]
                tc = jnp.where(typ == _ELL, t_e, t_c)
            if with_edge:
                # Silhouette-candidate metric in /scale space: squared
                # line-to-center distance minus 1 — the generic analogue
                # of sweep2's (h/r)^2 - 1, on the SAME local values.
                ex = lox / sx
                ey = loy / sy
                ez = loz / sz
                fx = ldx / sx
                fy = ldy / sy
                fz = ldz / sz
        # live mask alongside valid: dead lanes (d = 0) must report no hit
        # regardless of where their stale origin sits (the cuboid slab path
        # otherwise yields a finite tmax ~ 1e12 for an origin inside a box).
        tc = jnp.where(valid_col & live, tc, BIG_T)
        rid = g * gr + jax.lax.broadcasted_iota(jnp.int32, (gr, L), 0)
        if with_edge:
            # Silhouette-candidate metric in fused unit space: squared
            # line-to-center distance minus 1 (unit primitive) — the
            # generic analogue of sweep2's (h/r)^2 - 1.  Forward-only
            # (approaching) candidates; valid rows only.
            a_e = fx * fx + fy * fy + fz * fz
            hb_e = ex * fx + ey * fy + ez * fz
            cc_e = ex * ex + ey * ey + ez * ez
            ra_e = 1.0 / jnp.maximum(a_e, 1e-30)
            me = cc_e - hb_e * hb_e * ra_e - 1.0
            me = jnp.where((hb_e < 0.0) & valid_col & (a_e > 1e-30),
                           me, BIG_T)
            gm = jnp.min(me, axis=0, keepdims=True)
            ge = jnp.min(
                jnp.where(me == gm, rid, jnp.int32(0x7FFFFFFF)),
                axis=0, keepdims=True)
            be = gm < m_sc[:]
            m_sc[:] = jnp.where(be, gm, m_sc[:])
            e_sc[:] = jnp.where(be, ge, e_sc[:])
        if packed:
            ik = (jax.lax.bitcast_convert_type(tc, jnp.int32) & ~IDM) | rid
            gmin_i = jnp.min(ik, axis=0, keepdims=True)
            obj_sc[:] = jnp.minimum(obj_sc[:], gmin_i)
        else:
            gmin = jnp.min(tc, axis=0, keepdims=True)
            gobj = jnp.min(
                jnp.where(tc == gmin, rid, jnp.int32(0x7FFFFFFF)),
                axis=0, keepdims=True)
            better = gmin < t_sc[:]
            t_sc[:] = jnp.where(better, gmin, t_sc[:])
            obj_sc[:] = jnp.where(better, gobj, obj_sc[:])

    import os as _os
    _abl = frozenset(_os.environ.get("UBER_ABLATE", "").split(","))
    # Groups per taken pl.when (see sweep2._sweep_loop): a taken branch
    # costs ~2-4 us at L = 2048, so spanning groups under one branch can
    # beat per-group branches when most groups are entered anyway.
    _span = int(_os.environ.get("UBER_SPAN_G",
                                _os.environ.get("UBER_SPAN", "1")))

    def group_level(gs):
        if "noslab" in _abl:  # ablation: straight-line, no group branch
            for g in gs:
                group_body(g)
            return
        tb = t_best_now()
        ghit = jnp.zeros((1, L), jnp.bool_)
        for g in gs:
            ghit = ghit | _slab_hit(gaabb_ref, g, ox, oy, oz, ix, iy, iz,
                                    tb)
        ghit = ghit & live

        @pl.when(jnp.any(ghit))
        def _(gs=gs):
            for g in gs:
                group_body(g)

    def span_levels(g_lo, g_hi):
        for g0 in range(g_lo, g_hi, _span):
            group_level(range(g0, min(g0 + _span, g_hi)))

    if gkinds is not None and "nokinds" in _abl:
        gkinds = None
    if n_sgroups and "nosuper" not in _abl:
        for s in range(n_sgroups):
            shit = _slab_hit(gaabb_ref, sg0 + s, ox, oy, oz, ix, iy, iz,
                             t_best_now()) & live

            @pl.when(jnp.any(shit))
            def _(s=s):
                span_levels(s * SG, min((s + 1) * SG, n_groups))
    else:
        span_levels(0, n_groups)

    if packed:
        ik = obj_sc[:]
        rid_v = ik & IDM
        t_sc[:] = jax.lax.bitcast_convert_type(ik & ~IDM, jnp.float32)
        obj_sc[:] = jnp.where(rid_v == IDM, -1, rid_v)


def _sweep2g_nearest_kernel(n_groups: int, gr: int, has_motion: bool,
                            gkinds=None, n_sgroups: int = 0, sg0: int = 0,
                            with_edge: bool = False):
    def kernel(otab_ref, gaabb_ref, rays_ref, t_out, obj_out, *rest):
        rays = rays_ref[:]
        ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
        dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
        live = (dx * dx + dy * dy + dz * dz) > 0.5
        if with_edge:
            edge_out, t_sc, obj_sc, m_sc, e_sc = rest
        else:
            t_sc, obj_sc = rest
            m_sc = e_sc = None
        _sweep_loop_g(otab_ref, gaabb_ref, ox, oy, oz, dx, dy, dz,
                      rays[6:7], live, rays[7:8], t_sc, obj_sc, m_sc, e_sc,
                      n_groups=n_groups, gr=gr, has_motion=has_motion,
                      gkinds=gkinds, n_sgroups=n_sgroups, sg0=sg0,
                      with_edge=with_edge)
        t_out[:] = t_sc[:]
        obj_out[:] = obj_sc[:]
        if with_edge:
            edge_out[:] = e_sc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("gr", "has_motion", "block",
                                              "n_pgroups", "n_sgroups",
                                              "gkinds", "with_edge"))
def _sweep2g(otab, gaabb, rays, gr: int, has_motion: bool, block: int,
             n_pgroups: int = 0, n_sgroups: int = 0, gkinds=None,
             with_edge: bool = False):
    from raytracing_tests_tpu.kernels.sweep2 import PROBE_GR, _interpret

    # gaabb rows: [main groups][probe groups][super groups]
    n_pgroups_rows = n_pgroups * PROBE_GR
    n_groups = (otab.shape[0] - n_pgroups_rows) // gr  # main groups only
    sg0 = n_groups + n_pgroups
    Bp = rays.shape[1]
    lane = lambda rows: pl.BlockSpec((rows, block), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                 jax.ShapeDtypeStruct((1, Bp), jnp.int32)]
    out_specs = [lane(1), lane(1)]
    scratch = [pltpu.VMEM((1, block), jnp.float32),
               pltpu.VMEM((1, block), jnp.int32)]
    if with_edge:
        out_shape.append(jax.ShapeDtypeStruct((1, Bp), jnp.int32))
        out_specs.append(lane(1))
        scratch += [pltpu.VMEM((1, block), jnp.float32),
                    pltpu.VMEM((1, block), jnp.int32)]
    return pl.pallas_call(
        _sweep2g_nearest_kernel(n_groups, gr, has_motion, gkinds=gkinds,
                                n_sgroups=n_sgroups, sg0=sg0,
                                with_edge=with_edge),
        grid=(Bp // block,),
        in_specs=[full(otab), full(gaabb), lane(8)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
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
                      n_pgroups=getattr(accel, "n_pgroups", 0),
                      n_sgroups=getattr(accel, "n_sgroups", 0),
                      gkinds=getattr(accel, "gkinds", None))
    return t[0, :B], obj[0, :B]


def sweep2g_nearest_edge(accel: "Accel2G", o, d, time_ratio, t_limit,
                         block: int = 2048):
    """(t, obj_sorted, edge_sorted): adds the near-miss silhouette
    candidate (argmin of the fused-space line-distance metric over forward
    objects) for the generic soft-edge estimator — the generic analogue of
    ``sweep2.sweep2_nearest_edge``."""
    from raytracing_tests_tpu.kernels.sweep2 import pack_rays

    rays, B = pack_rays(o, d, time_ratio, t_limit, block)
    t, obj, edge = _sweep2g(accel.otab, accel.gaabb, rays, accel.gr,
                            accel.has_motion, block,
                            n_pgroups=getattr(accel, "n_pgroups", 0),
                            n_sgroups=getattr(accel, "n_sgroups", 0),
                            gkinds=getattr(accel, "gkinds", None),
                            with_edge=True)
    return t[0, :B], obj[0, :B], edge[0, :B]


def _ri_probe_g(otab_ref, gaabb_ref, qx, qy, qz, omt, *, n_groups, gr,
                has_motion, need=None, g0=0, row0=0):
    """Surrounding-RI containment sum at probe point q, generic mode: the
    rotated point-in-primitive test in the fused unit space
    (e = M (q - c + omt*dp); ellipsoid |e|^2 <= 1, cuboid all |e| <= 0.5).
    Straight-line, branch-free, plain-value accumulators — branches cost
    more than the few PROBE_GR-row containment bodies they could skip
    (see ``sweep2._ri_probe``)."""
    del need  # containment is exact; no skip is profitable (see docstring)
    L = qx.shape[1]

    # (gr, L)-plane accumulators, ONE final reduction (see sweep2._ri_probe).
    acc8 = jnp.zeros((gr, L), jnp.float32)
    cnt8 = jnp.zeros((gr, L), jnp.float32)
    for g in range(g0, g0 + n_groups):
        r0 = row0 + (g - g0) * gr
        sl = slice(r0, r0 + gr)
        zero = jnp.zeros((1, L), jnp.float32)
        ex, ey, ez, _, _, _ = _fused_frame(
            otab_ref, sl, qx, qy, qz, zero, zero, zero, omt, has_motion)
        in_e = ex * ex + ey * ey + ez * ez <= 1.0
        in_c = ((jnp.abs(ex) <= 0.5) & (jnp.abs(ey) <= 0.5)
                & (jnp.abs(ez) <= 0.5))
        typ = otab_ref[sl, GO_TYPE : GO_TYPE + 1]
        inside = (jnp.where(typ == _ELL, in_e,
                            (typ == float(geometry.CUBOID)) & in_c)
                  & (otab_ref[sl, GO_VALID : GO_VALID + 1] > 0.0))
        ri_col = otab_ref[sl, GO_RI : GO_RI + 1]
        acc8 = acc8 + jnp.where(inside, ri_col, 0.0)
        cnt8 = cnt8 + jnp.where(inside, 1.0, 0.0)
    acc = jnp.sum(acc8, axis=0, keepdims=True)
    cnt = jnp.sum(cnt8, axis=0, keepdims=True)
    return jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)


def _winner_refine_g(rows, ox, oy, oz, dx, dy, dz, omt, t_best, hit,
                     has_motion):
    """Per-lane exact re-intersection of the winning generic object from
    its gathered row: local-frame transform, type-selected primitive test,
    and the world-space hit normal (rotated ``geometry.primitive_normal``).
    Returns (t_best, t_safe, px, py, pz, nx, ny, nz, lpx, lpy, lpz) — the
    contract of ``sweep2._winner_refine``; (lpx, lpy, lpz) is the
    unit-space hit position (``Hit.local_pos`` = p_local / scale,
    ``ops/intersect.py:68``) consumed by cube-sphere texturing."""
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
    t_e, t_c = _both_t_exact(lox, loy, loz, ldx, ldy, ldz, sx, sy, sz)
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
    # Unit-space hit position (miss/padding rows carry zero scale -> guard).
    lpx = plx / jnp.where(sx > 0.0, sx, 1.0)
    lpy = ply / jnp.where(sy > 0.0, sy, 1.0)
    lpz = plz / jnp.where(sz > 0.0, sz, 1.0)
    return t_best, t_safe, px, py, pz, nx, ny, nz, lpx, lpy, lpz
