"""Work-queue renderer driven by the forward megakernel.

Same device-resident queue discipline as ``ops.workqueue`` (one
``lax.while_loop``, write-once ray pool, zero host syncs) but the per-chunk
work — sweep, winner gather, surrounding RI, shading, child generation — is
ONE Pallas kernel call (``kernels.mega``).  XLA's share of an iteration
shrinks to: slice the pool, scatter-add the color planes, sort-compact the
children, append.

Scope (asserted): sphere-mode scene, 'bvh' shading, no lights, no textures
— the headline benchmark family.  ``ops.render``/``ops.workqueue`` remain
the fully-featured paths.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.kernels.mega import P_BOUNCED, POOL_ROWS, mega_step
from raytracing_tests_tpu.kernels.sweep2 import DEFAULT_GR, make_accel2
from raytracing_tests_tpu.ops.render import (
    Lights,
    RenderConfig,
    _lane_inputs,
    finalize,
)
from raytracing_tests_tpu.scene.types import Camera, Scene

DEFAULT_CHUNK = 1 << 20


@partial(jax.jit, static_argnames=("cfg", "chunk", "n_lanes", "max_iters",
                                    "block", "gr"))
def _drain(otab, ftab3, gaabb, pool, lane, write0, cfg: RenderConfig,
           chunk: int, n_lanes: int, max_iters: int, block: int, gr: int):
    C = chunk
    B = n_lanes
    P = lane.shape[0]

    color = jnp.zeros((3 * B + 1,), jnp.float32)
    primary_t = jnp.full((B + 1,), cfg.t_max, jnp.float32)

    def cond(st):
        read, write, it = st[0], st[1], st[2]
        return (read < write) & (it < max_iters)

    def body(st):
        (read, write, it, pool, lane, color, primary_t, rays, dropped) = st
        avail = jnp.minimum(C, write - read)
        pslice = jax.lax.dynamic_slice(pool, (0, read), (POOL_ROWS, C))
        l = jax.lax.dynamic_slice(lane, (read,), (C,))
        rowpos = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
        l = jnp.where(rowpos < avail, l, -1)

        misc, refr, refl, rlane, llane = mega_step(
            otab, ftab3, gaabb, pslice, l, gr,
            cfg.has_motion, cfg.has_dielectrics, cfg.spp, cfg.max_bounces,
            cfg.t_max, cfg.background, block=block,
        )

        active = l >= 0
        idx = jnp.concatenate([
            jnp.where(active, l, 3 * B),
            jnp.where(active, l + B, 3 * B),
            jnp.where(active, l + 2 * B, 3 * B),
        ])
        upd = jnp.concatenate([misc[0], misc[1], misc[2]])
        color = color.at[idx].add(upd)
        bounced0 = pslice[P_BOUNCED] == 0.0
        is_primary = active & bounced0
        primary_t = primary_t.at[jnp.where(is_primary, l, B)].set(misc[3])

        # Children: stable valid-first compaction via an 18-operand 1-bit-key
        # sort.  Measured (scripts/gluebench.py, v5e): XLA lowers the 0/1
        # stable key sort to a radix partition — 0.18 ms for all 18 operands
        # at 2M lanes, 30x FASTER than a single 30-bit i32 key sort + gather
        # (5.7 + 0.5 ms).  Keep the key 1-bit.
        ch_lane = jnp.concatenate([rlane, llane])
        ch_rows = [jnp.concatenate([refr[k], refl[k]]) for k in range(POOL_ROWS)]
        valid = ch_lane >= 0
        key = jnp.where(valid, jnp.int32(0), jnp.int32(1))
        sorted_ = jax.lax.sort([key, ch_lane] + ch_rows, num_keys=1,
                               is_stable=True)
        packed_lane = jnp.where(sorted_[0] == 0, sorted_[1], -1)
        packed = jnp.stack(sorted_[2:])
        n_children = jnp.sum(valid.astype(jnp.int32))

        w = jnp.minimum(write, P - 2 * C)
        pool = jax.lax.dynamic_update_slice(pool, packed, (0, w))
        lane = jax.lax.dynamic_update_slice(lane, packed_lane, (w,))
        new_write = jnp.minimum(write + n_children, P - 2 * C)
        dropped = dropped + (write + n_children - new_write)

        rays = rays + jnp.sum(active.astype(jnp.int32))
        return (read + avail, new_write, it + 1, pool, lane, color,
                primary_t, rays, dropped)

    st = (jnp.int32(0), write0, jnp.int32(0), pool, lane, color, primary_t,
          jnp.int32(0), jnp.int32(0))
    st = jax.lax.while_loop(cond, body, st)
    _, _, iters, _, _, color, primary_t, rays, dropped = st
    rgb = color[: 3 * B].reshape(3, B)
    return rgb, primary_t[:B], rays, iters, dropped


def _init_slab(o, d, time_ratio, cfg: RenderConfig, P: int, n: int):
    """Pool + lane arrays for one slab of ``n`` primaries (slab-local ids)."""
    SB = o.shape[0]
    pool = jnp.zeros((POOL_ROWS, P), jnp.float32)
    pool = pool.at[0, :SB].set(o[:, 0]).at[1, :SB].set(o[:, 1]).at[2, :SB].set(o[:, 2])
    pool = pool.at[3, :SB].set(d[:, 0]).at[4, :SB].set(d[:, 1]).at[5, :SB].set(d[:, 2])
    pool = pool.at[6, :SB].set(1.0 - time_ratio)
    pool = pool.at[7, :SB].set(cfg.t_max)
    pool = pool.at[8, :SB].set(1.0)
    ids = jnp.arange(SB, dtype=jnp.int32)
    lane = jnp.full((P,), -1, jnp.int32).at[:SB].set(jnp.where(ids < n, ids, -1))
    return pool, lane


def render_mega(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    chunk: int = DEFAULT_CHUNK,
    pool_factor: float = 3.2,
    block: int = 2048,
    slab: int = 4 << 20,
    gr: int = 32,
):
    """Full render via the megakernel; dict(image, depth, rays, ...).

    Primaries drain in slabs of ``slab`` lanes, each with its own bounded
    pool (HBM peak stays ~pool_factor * slab * 64 B regardless of W*H*spp);
    one compiled ``_drain`` serves every slab."""
    assert lights is None, "megakernel path: no emissive lights (use queue)"
    assert cfg.shading == "bvh", "megakernel path implements INW shading"
    assert cfg.pallas_mode == "spheres", "megakernel path is sphere-mode"
    assert scene.textures is None, "megakernel path is untextured"
    H, W, S = cfg.height, cfg.width, cfg.spp
    B = H * W * S
    accel = make_accel2(scene, gr=gr, has_motion=cfg.has_motion,
                        probe_rows=cfg.probe_rows)
    o, d, time_ratio, _ = _lane_inputs(camera, cfg)

    SB = min(slab, -(-B // block) * block)
    chunk = min(chunk, SB)
    P = max(int(SB * pool_factor), SB + 4 * chunk)
    P = -(-P // chunk) * chunk
    max_iters = P // chunk + 8 * (cfg.max_bounces + 1)

    parts = []
    rays = jnp.int32(0)
    iters = jnp.int32(0)
    dropped = jnp.int32(0)
    for s0 in range(0, B, SB):
        n = min(SB, B - s0)
        osl = jax.lax.dynamic_slice_in_dim(o, s0, SB) if s0 + SB <= B else (
            jnp.pad(o[s0:], ((0, SB - n), (0, 0))))
        dsl = jax.lax.dynamic_slice_in_dim(d, s0, SB) if s0 + SB <= B else (
            jnp.pad(d[s0:], ((0, SB - n), (0, 0))))
        tsl = time_ratio[s0 : s0 + SB] if s0 + SB <= B else jnp.pad(
            time_ratio[s0:], (0, SB - n))
        pool, lane = _init_slab(osl, dsl, tsl, cfg, P, n)
        rgb, pt, r, it, dr = _drain(
            accel.otab, accel.ftab3, accel.gaabb, pool, lane, jnp.int32(SB),
            cfg, chunk, SB, max_iters, block, gr,
        )
        parts.append((rgb[:, :n], pt[:n]))
        rays, iters, dropped = rays + r, iters + it, dropped + dr

    rgb = jnp.concatenate([p[0] for p in parts], axis=1)
    primary_t = jnp.concatenate([p[1] for p in parts])
    colors = jnp.moveaxis(rgb, 0, -1).reshape(H, W, S, 3)
    out = finalize(colors, primary_t.reshape(H, W, S), cfg)
    out["rays"] = rays
    out["iterations"] = iters
    out["rays_dropped"] = dropped
    return out
