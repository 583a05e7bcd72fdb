"""Lane-aligned megakernel renderer: the headline-bench fast path.

Profiling the compaction-based driver (retired ``ops.megaqueue``, in git
history) on a real v5e
showed the TPU truth: scatters and multi-operand sorts over million-lane 1D
arrays cost ~8-25 ms PER ITERATION in situ — an order of magnitude more
than the fused Pallas megakernel they were feeding (scripts/megaprof.py).
Dense, lane-aligned state is the only shape the hardware rewards.

So this driver keeps every per-ray record AT ITS LANE for the whole drain —
the TPU analogue of the reference kernel's per-thread ray stack
(``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:80-108``):

  - ``cur``   (16, C): the ray each lane is tracing right now.
  - ``queue`` (Q, 16, C): a per-lane LIFO stack, one-hot push/pop — pure
    dense ops, no cross-lane movement ever.
  - Reflection children continue IN PLACE (the reference pushes refraction
    then reflection and pops reflection first — an in-place reflection
    continuation plus a queued refraction is the same LIFO order).
  - Color accumulates with a dense aligned add; no scatter exists anywhere.

Dead lanes cost almost nothing: the sweep kernel's group-entry test is
masked with the live mask, so a lane block whose rays have all terminated
skips every object group and pays only the slab tests.  Early exit ends a
chunk as soon as every lane has drained (sky chunks: one iteration).

Scope (asserted): sphere-mode scene, 'bvh' shading, no lights, no textures
— the headline benchmark family.  ``ops.render`` remains the fully-featured
path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.kernels.mega import POOL_ROWS, mega_step
from raytracing_tests_tpu.kernels.sweep2 import make_accel2
from raytracing_tests_tpu.ops.render import (
    Lights,
    RenderConfig,
    _lane_inputs,
    finalize,
)
from raytracing_tests_tpu.scene.types import Camera, Scene

DEFAULT_CHUNK = 1 << 20


@partial(jax.jit, static_argnames=("cfg", "n_lanes", "block", "gr", "qcap"))
def _drain_chunk(otab, ftab3, gaabb, cur, lane, cfg: RenderConfig,
                 n_lanes: int, block: int, gr: int, qcap: int):
    """Drain one chunk of lanes to completion; returns
    (color (3, C), primary_t (C,), rays_per_lane (C,), iters, dropped)."""
    C = n_lanes
    Q = qcap

    # Queued records keep only the 8 live rows (o, d, contrib, bounced):
    # omt is a per-lane constant and t_limit is cfg.t_max for every child —
    # reconstructed on pop.  Halves the per-iteration queue traffic.
    omt_row = cur[6:7]
    queue = jnp.zeros((Q, 8, C), jnp.float32)
    qsize = jnp.zeros((C,), jnp.int32)
    color = jnp.zeros((3, C), jnp.float32)
    primary_t = jnp.full((C,), cfg.t_max, jnp.float32)

    def cond(st):
        lane, it = st[1], st[8]
        return (it < cfg.pops) & jnp.any(lane >= 0)

    def body(st):
        (cur, lane, queue, qsize, color, primary_t, rays, dropped, it) = st

        misc, refr, refl, rlane, llane = mega_step(
            otab, ftab3, gaabb, cur, lane, gr,
            cfg.has_motion, cfg.has_dielectrics, cfg.spp, cfg.max_bounces,
            cfg.t_max, cfg.background, block=block,
        )

        active = lane >= 0
        color = color + misc[0:3]  # kernel zeroes inactive lanes
        primary_t = jnp.where((it == 0) & active, misc[3], primary_t)
        rays = rays + active.astype(jnp.int32)  # per-lane ray-tree size

        has_refl = llane >= 0
        has_refr = rlane >= 0

        # Both children: the refraction waits on the per-lane stack while
        # the reflection continues in place (reference LIFO order).
        push = has_refl & has_refr
        can = qsize < Q
        do_push = push & can
        dropped = dropped + jnp.sum((push & ~can).astype(jnp.int32))
        refr8 = jnp.concatenate([refr[0:6], refr[8:10]], axis=0)
        oh_push = (
            jax.lax.broadcasted_iota(jnp.int32, (Q, C), 0) == qsize[None, :]
        ) & do_push[None, :]
        queue = jnp.where(oh_push[:, None, :], refr8[None, :, :], queue)
        qsize = qsize + do_push.astype(jnp.int32)

        # Continue in place, else pop the stack, else the lane dies.
        need_pop = active & ~has_refl & ~has_refr
        do_pop = need_pop & (qsize > 0)
        oh_pop = (
            jax.lax.broadcasted_iota(jnp.int32, (Q, C), 0) == (qsize - 1)[None, :]
        ) & do_pop[None, :]
        popped8 = jnp.sum(jnp.where(oh_pop[:, None, :], queue, 0.0), axis=0)
        qsize = qsize - do_pop.astype(jnp.int32)
        popped = jnp.concatenate([
            popped8[0:6], omt_row,
            jnp.full((1, C), cfg.t_max, jnp.float32), popped8[6:8],
            jnp.zeros((6, C), jnp.float32),
        ], axis=0)

        cur = jnp.where(has_refl[None, :], refl,
                        jnp.where(has_refr[None, :], refr, popped))
        lane = jnp.where(has_refl | has_refr | do_pop, lane, -1)
        return (cur, lane, queue, qsize, color, primary_t, rays, dropped,
                it + 1)

    st = (cur, lane, queue, qsize, color, primary_t,
          jnp.zeros((C,), jnp.int32), jnp.int32(0), jnp.int32(0))
    st = jax.lax.while_loop(cond, body, st)
    _, _, _, _, color, primary_t, rays, dropped, iters = st
    return color, primary_t, rays, iters, dropped


def _init_chunk(o, d, time_ratio, lane, cfg: RenderConfig):
    """(C, 3) x2 + (C,) x2 -> (16, C) pool-layout primary records."""
    C = o.shape[0]
    z = jnp.zeros((C,), jnp.float32)
    live = (lane >= 0).astype(jnp.float32)
    return jnp.stack([
        o[:, 0], o[:, 1], o[:, 2],
        d[:, 0] * live, d[:, 1] * live, d[:, 2] * live,
        1.0 - time_ratio, jnp.full((C,), cfg.t_max, jnp.float32),
        live, z, z, z, z, z, z, z,
    ])


def _drain_lanes(accel, o, d, time_ratio, ids, cfg, C, block, gr):
    """Drain a flat lane population in chunks of C; returns
    (rgb (3, B), primary_t (B,), rays_per_lane (B,), iters, dropped)."""
    B = o.shape[0]
    n_chunks = -(-B // C)
    Bp = n_chunks * C
    if Bp != B:
        o = jnp.pad(o, ((0, Bp - B), (0, 0)))
        d = jnp.pad(d, ((0, Bp - B), (0, 0)))
        time_ratio = jnp.pad(time_ratio, (0, Bp - B))
        ids = jnp.pad(ids, (0, Bp - B), constant_values=-1)

    colors, pts, rayss = [], [], []
    iters = jnp.int32(0)
    dropped = jnp.int32(0)
    for c0 in range(0, Bp, C):
        lane = ids[c0 : c0 + C]
        cur = _init_chunk(o[c0 : c0 + C], d[c0 : c0 + C],
                          time_ratio[c0 : c0 + C], lane, cfg)
        col, pt, r, it, dr = _drain_chunk(
            accel.otab, accel.ftab3, accel.gaabb, cur, lane, cfg, C, block,
            gr, cfg.queue_capacity)
        colors.append(col)
        pts.append(pt)
        rayss.append(r)
        iters, dropped = iters + it, dropped + dr

    rgb = jnp.concatenate(colors, axis=1)[:, :B]
    primary_t = jnp.concatenate(pts)[:B]
    rays_lane = jnp.concatenate(rayss)[:B]
    return rgb, primary_t, rays_lane, iters, dropped


def render_megalanes(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    chunk: int = DEFAULT_CHUNK,
    block: int = 2048,
    gr: int = 32,
    schedule: str = "sorted",
):
    """Full render via the lane-aligned megakernel drain;
    dict(image, depth, rays, iterations, rays_dropped).

    ``schedule='sorted'`` runs a 1-spp prepass that measures each PIXEL's
    ray-tree size, then drains pixels in sorted-workload order so every
    chunk carries near-uniform trees — the early-exit tail (a whole chunk
    iterating for its single deepest glass pixel) collapses.  Results are
    un-permuted with one pixel-level gather; no scatter anywhere.
    """
    assert lights is None, "megalanes path: no emissive lights (use queue)"
    assert cfg.shading == "bvh", "megalanes path implements INW shading"
    assert cfg.pallas_mode == "spheres", "megalanes path is sphere-mode"
    assert scene.textures is None, "megalanes path is untextured"
    H, W, S = cfg.height, cfg.width, cfg.spp
    B = H * W * S
    P = H * W
    C = min(chunk, -(-B // block) * block)
    accel = make_accel2(scene, gr=gr, has_motion=cfg.has_motion,
                        probe_rows=cfg.probe_rows,
                        sort_origin=camera.position)
    o, d, time_ratio, _ = _lane_inputs(camera, cfg)
    ids = jnp.arange(B, dtype=jnp.int32)

    iters = jnp.int32(0)
    if schedule == "sorted" and S > 1:
        import dataclasses

        pre_cfg = dataclasses.replace(cfg, spp=1)
        po, pd_, ptr, _ = _lane_inputs(camera, pre_cfg)
        pre_C = min(C, -(-P // block) * block)
        _, _, sizes, pit, _ = _drain_lanes(
            accel, po, pd_, ptr, jnp.arange(P, dtype=jnp.int32), pre_cfg,
            pre_C, block, gr)
        iters = iters + pit
        perm = jnp.argsort(sizes)  # (P,) ascending pixel workload
        o = o.reshape(P, S, 3)[perm].reshape(B, 3)
        d = d.reshape(P, S, 3)[perm].reshape(B, 3)
        time_ratio = time_ratio.reshape(P, S)[perm].reshape(B)
        ids = ids.reshape(P, S)[perm].reshape(B)

    rgb, primary_t, rays_lane, dit, dropped = _drain_lanes(
        accel, o, d, time_ratio, ids, cfg, C, block, gr)
    iters = iters + dit
    rays = jnp.sum(rays_lane)

    if schedule == "sorted" and S > 1:
        inv = jnp.argsort(perm)
        rgb = rgb.reshape(3, P, S)[:, inv].reshape(3, B)
        primary_t = primary_t.reshape(P, S)[inv].reshape(B)

    colors3 = jnp.moveaxis(rgb, 0, -1).reshape(H, W, S, 3)
    out = finalize(colors3, primary_t.reshape(H, W, S), cfg)
    out["rays"] = rays
    out["iterations"] = iters
    out["rays_dropped"] = dropped
    return out
