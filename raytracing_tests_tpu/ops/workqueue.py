"""Device-side work-queue renderer: the whole bounce loop in one jit.

Evolution of the round-based wavefront (retired ``ops.wavefront``, in git
history): profiling on a
tunneled v5e showed ~28 ms of host RPC latency per bounce round plus
lockstep waste on small tail rounds.  This renderer removes both:

  - The ray pool is a write-once queue in HBM: primaries occupy [0, B);
    every processed chunk appends its compacted children at the write
    cursor.  ``read``/``write`` cursors live on device.
  - One ``lax.while_loop`` drains the queue chunk by chunk.  Because
    children from successive generations land contiguously, small bounce
    generations COALESCE into full chunks — tail occupancy stays high
    without any host-side scheduling, and the host syncs exactly once.

Same ray tree and shading as the queue renderer (``shade_rays``); summed
radiance identical up to f32 ordering.  Ray-drop only on pool overflow
(capacity ~3.2x the primary count; the measured tree needs ~2.6x).

Not differentiable (while_loop + Pallas); the scan/dense path in
``ops.render`` remains the gradient renderer.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.ops.render import (
    Lights,
    RenderConfig,
    _build_accel,
    _lane_inputs,
    finalize,
    shade_rays,
)
from raytracing_tests_tpu.scene.types import Camera, Scene

DEFAULT_CHUNK = 262144
N_FIELDS = 8  # o(3) d(3) contrib bounced

_PERM_CACHE = {}


def tile_order_perm(width: int, height: int, spp: int, tile: int):
    """Permutation placing lanes in (tile_y, tile_x, y, x, s) order.

    Pallas blocks then cover square pixel neighborhoods instead of full image
    rows, which is what makes group-AABB culling effective: a 4096-lane block
    at 4 spp spans a 32x32-pixel area instead of 1.3 full rows.
    Lane IDS are unchanged — only the processing order permutes, and the
    scatter-based accumulation is order-blind.
    """
    import numpy as np

    key = (width, height, spp, tile)
    if key not in _PERM_CACHE:
        ids = np.arange(width * height * spp, dtype=np.int32).reshape(height, width, spp)
        ph = -(-height // tile) * tile
        pw = -(-width // tile) * tile
        padded = np.full((ph, pw, spp), -1, np.int32)
        padded[:height, :width] = ids
        t = (
            padded.reshape(ph // tile, tile, pw // tile, tile, spp)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1)
        )
        _PERM_CACHE[key] = t[t >= 0]  # drop pad entries -> exactly B lanes
    return _PERM_CACHE[key]


@partial(jax.jit, static_argnames=("cfg", "chunk", "n_lanes", "max_iters"))
def _drain_queue(
    scene,
    accel,
    lights,
    pool_fields,  # (8, P) with primaries in [:, :B]
    pool_lane,  # (P,)
    write0,  # () i32: initial write cursor (= B)
    cfg: RenderConfig,
    chunk: int,
    n_lanes: int,
    max_iters: int,
):
    C = chunk
    B = n_lanes
    P = pool_lane.shape[0]

    color = jnp.zeros((3 * B + 1,), jnp.float32)  # flat rgb planes (+drop slot)
    white = jnp.zeros((B + 1,), jnp.float32)
    primary_t = jnp.full((B + 1,), cfg.t_max, jnp.float32)

    def cond(st):
        read, write, it = st[0], st[1], st[2]
        return (read < write) & (it < max_iters)

    def body(st):
        (read, write, it, pool_fields, pool_lane,
         color, white, primary_t, rays, dropped) = st
        avail = jnp.minimum(C, write - read)
        f = jax.lax.dynamic_slice(pool_fields, (0, read), (N_FIELDS, C))
        l = jax.lax.dynamic_slice(pool_lane, (read,), (C,))
        live = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0] < avail
        l = jnp.where(live, l, -1)

        o = jnp.stack([f[0], f[1], f[2]], axis=1)
        d = jnp.stack([f[3], f[4], f[5]], axis=1)
        contrib, bounced = f[6], f[7].astype(jnp.int32)
        active = l >= 0
        sample_idx = (l % jnp.int32(cfg.spp)).astype(jnp.float32)
        time_ratio = sample_idx / cfg.spp

        r = shade_rays(
            scene, lights, cfg, accel, o, d, contrib, bounced, active,
            sample_idx, time_ratio,
        )

        lane_safe = jnp.where(active, l, B)  # drop slot
        is_primary = active & (bounced == 0)
        idx = jnp.concatenate([
            jnp.where(active, l, 3 * B),
            jnp.where(active, l + B, 3 * B),
            jnp.where(active, l + 2 * B, 3 * B),
        ])
        upd = jnp.concatenate([r.add_color[:, 0], r.add_color[:, 1], r.add_color[:, 2]])
        color = color.at[idx].add(upd)
        white = white.at[lane_safe].add(r.set_white.astype(jnp.float32))
        primary_t = primary_t.at[jnp.where(is_primary, l, B)].set(r.hit_t)

        # Children -> stable sort compaction (valid first), append at write.
        ch_lane = jnp.concatenate(
            [jnp.where(r.refr_mask, l, -1), jnp.where(r.refl_mask, l, -1)]
        )
        bf = r.bounced.astype(jnp.float32)
        ch_planes = [
            jnp.concatenate([r.refr_o[:, 0], r.refl_o[:, 0]]),
            jnp.concatenate([r.refr_o[:, 1], r.refl_o[:, 1]]),
            jnp.concatenate([r.refr_o[:, 2], r.refl_o[:, 2]]),
            jnp.concatenate([r.refr_d[:, 0], r.refl_d[:, 0]]),
            jnp.concatenate([r.refr_d[:, 1], r.refl_d[:, 1]]),
            jnp.concatenate([r.refr_d[:, 2], r.refl_d[:, 2]]),
            jnp.concatenate([r.refr_contrib, r.refl_contrib]),
            jnp.concatenate([bf, bf]),
        ]
        valid = ch_lane >= 0
        key = jnp.where(valid, jnp.int32(0), jnp.int32(1))
        sorted_ = jax.lax.sort([key, ch_lane] + ch_planes, num_keys=1, is_stable=True)
        packed_lane = jnp.where(sorted_[0] == 0, sorted_[1], -1)
        packed = jnp.stack(sorted_[2:])
        n_children = jnp.sum(valid.astype(jnp.int32))

        w = jnp.minimum(write, P - 2 * C)  # clamp on overflow (drops late rays)
        pool_fields = jax.lax.dynamic_update_slice(pool_fields, packed, (0, w))
        pool_lane = jax.lax.dynamic_update_slice(pool_lane, packed_lane, (w,))
        new_write = jnp.minimum(write + n_children, P - 2 * C)
        dropped = dropped + (write + n_children - new_write)

        rays = rays + jnp.sum(active.astype(jnp.int32))
        return (read + avail, new_write, it + 1, pool_fields, pool_lane,
                color, white, primary_t, rays, dropped)

    st = (
        jnp.int32(0), write0, jnp.int32(0), pool_fields, pool_lane,
        color, white, primary_t, jnp.int32(0), jnp.int32(0),
    )
    st = jax.lax.while_loop(cond, body, st)
    _, _, iters, _, _, color, white, primary_t, rays, dropped = st

    rgb = color[: 3 * B].reshape(3, B)
    rgb = jnp.where(white[:B] > 0.0, 1.0, rgb)  # emissive abort -> white
    return rgb, primary_t[:B], rays, iters, dropped


def render_workqueue(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    chunk: int = DEFAULT_CHUNK,
    pool_factor: float = 3.2,
    tile: int = 0,  # pixel-tile pool order: helps culling at low spp, but the
    # eager 36M-row permutation gather costs seconds at high spp — opt-in
):
    """Full render; dict(image, depth, rays) like ``render_stats``."""
    assert cfg.shading == "bvh", (
        "workqueue pool records carry no medium stack; materials shading "
        "runs on the queue renderer (render_stats)"
    )
    H, W, S = cfg.height, cfg.width, cfg.spp
    B = H * W * S
    accel = _build_accel(scene, cfg)
    o, d, _, _ = _lane_inputs(camera, cfg)

    chunk = min(chunk, -(-B // 128) * 128)
    P = max(int(B * pool_factor), B + 4 * chunk)
    P = -(-P // chunk) * chunk

    if tile and tile > 1:
        perm = jnp.asarray(tile_order_perm(W, H, S, tile))
        o, d = o[perm], d[perm]
        lane0 = perm
    else:
        lane0 = jnp.arange(B, dtype=jnp.int32)

    fields = jnp.zeros((N_FIELDS, P), jnp.float32)
    for i in range(3):
        fields = fields.at[i, :B].set(o[:, i]).at[3 + i, :B].set(d[:, i])
    fields = fields.at[6, :B].set(1.0)
    lane = jnp.full((P,), -1, jnp.int32).at[:B].set(lane0)

    max_iters = P // chunk + 8 * (cfg.max_bounces + 1)
    rgb, primary_t, rays, iters, dropped = _drain_queue(
        scene, accel, lights, fields, lane, jnp.int32(B), cfg, chunk, B, max_iters
    )
    colors = jnp.moveaxis(rgb, 0, -1).reshape(H, W, S, 3)
    out = finalize(colors, primary_t.reshape(H, W, S), cfg)
    out["rays"] = rays
    out["iterations"] = iters
    out["rays_dropped"] = dropped
    return out
