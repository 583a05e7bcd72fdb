"""Compacting wavefront renderer: the high-throughput forward path.

The per-lane queue renderer (``ops.render``) is faithful to the reference's
stack semantics but lockstep: every pop iteration processes ALL lanes even
though most queues drain after 2-3 pops (measured ~2.6 active pops of ~9
executed on the cover scene).  This renderer restructures the bounce loop the
TPU-native way:

  round 0   all primary rays, chunked, full occupancy
  round k   only the rays actually spawned in round k-1, globally compacted
            into a dense pool, chunked at full occupancy

Per chunk: one Pallas sweep + shade (``ops.render.shade_rays``), scatter-add
of contributions into the per-sample accumulator (0.08 ms / chunk measured on
v5e), chunk-local cumsum+scatter compaction of spawned children (0.43 ms),
and a ``dynamic_update_slice`` append into the next round's pool at a
device-resident offset (one host sync per ROUND, not per chunk).

Semantics vs the queue renderer: identical ray tree (same spawn rules, same
bounce caps) traversed breadth-first instead of LIFO, so summed radiance is
identical up to f32 addition order UNLESS the queue's capacity-5 drop rule
triggers (deep dielectric trees) — the wavefront pool is far larger, so this
renderer loses FEWER rays than the reference; parity tests pin scenes where
no drops occur.  Emissive abort is order-independent here: lanes that ever
hit an emitter are forced to pure white at the end (exactly the reference's
"return white for this sample", lights glsl:662-666).  If a round's children
overflow the pool, appends clamp to the tail region (late rays replace,
rather than extend, the overflow set — the reference's stack drop is the
same class of truncation).

Not differentiable and not jittable end-to-end (host round loop): this is
the production forward/benchmark path; use the queue renderer for gradients.
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


@partial(
    jax.jit,
    static_argnames=("cfg", "is_primary_round", "n_lanes", "chunk"),
    donate_argnums=(0, 1, 2, 3, 4),
)
def _chunk_step(
    color,  # (3, B) accumulator planes (donated)
    white,  # (B,) f32 emissive-abort marker (donated)
    primary_t,  # (B,) primary hit t (donated)
    next_fields,  # (8, P) next-round pool planes (donated)
    next_lane,  # (P,) i32 (donated)
    offset,  # () i32 device-resident pool write position
    scene,
    accel,
    lights,
    fields,  # (8, C) chunk ray planes
    lane,  # (C,) i32, -1 = padding
    cfg: RenderConfig,
    is_primary_round: bool,
    n_lanes: int,
    chunk: int,
):
    """One chunk of one bounce round.

    LAYOUT NOTE: every array here is SoA planes.  Stacking planes into
    (C, 3) vectors is free on TPU (XLA assigns the transposed plane layout),
    but scatters of such row-vectors hit a 3-strided slow path measured at
    ~25 ms vs ~0.05 ms for plane-contiguous scatters — hence color is (3, B)
    and the pool is (8, P), with every scatter running on a 1-D plane.
    """
    C = chunk
    P = next_lane.shape[0]
    o = jnp.stack([fields[0], fields[1], fields[2]], axis=1)
    d = jnp.stack([fields[3], fields[4], fields[5]], axis=1)
    contrib, bounced = fields[6], fields[7].astype(jnp.int32)
    active = lane >= 0
    sample_idx = (lane % jnp.int32(cfg.spp)).astype(jnp.float32)
    time_ratio = sample_idx / cfg.spp

    r = shade_rays(
        scene, lights, cfg, accel, o, d, contrib, bounced, active, sample_idx, time_ratio
    )

    # One fused scatter for r, g, b, white: flat (4P,) buffer indexing.
    # (A "dense slice update" variant for the contiguous round-0 lanes was
    # measured at 8.5 s/call on v5e — XLA lowers the read-modify-write row
    # chain pathologically — while this scatter path costs ~1 ms.)
    lane_safe = jnp.where(active, lane, 4 * n_lanes)  # OOB marker -> drop
    idx = jnp.concatenate(
        [lane_safe, lane_safe + n_lanes, lane_safe + 2 * n_lanes, lane_safe + 3 * n_lanes]
    )
    upd = jnp.concatenate(
        [r.add_color[:, 0], r.add_color[:, 1], r.add_color[:, 2],
         r.set_white.astype(jnp.float32)]
    )
    flat = jnp.concatenate([color.reshape(-1), white])
    flat = flat.at[idx].add(upd, mode="drop")
    color = flat[: 3 * n_lanes].reshape(3, n_lanes)
    white = flat[3 * n_lanes :]
    if is_primary_round:
        primary_t = primary_t.at[jnp.where(active, lane, n_lanes)].set(
            r.hit_t, mode="drop"
        )

    # Children: refraction then reflection (same spawn set as the queue).
    ch_lane = jnp.concatenate(
        [jnp.where(r.refr_mask, lane, -1), jnp.where(r.refl_mask, lane, -1)]
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

    # Chunk-local compaction via one stable multi-operand sort (valid rays
    # first) — measured ~1.5 ms vs ~21 ms for cumsum+scatter on v5e.
    valid = ch_lane >= 0
    key = jnp.where(valid, jnp.int32(0), jnp.int32(1))
    sorted_ = jax.lax.sort([key, ch_lane] + ch_planes, num_keys=1, is_stable=True)
    packed_lane = jnp.where(sorted_[0] == 0, sorted_[1], -1)
    packed = jnp.stack(sorted_[2:])  # (8, 2C)
    n_children = jnp.sum(valid.astype(jnp.int32))

    # Append into the pool at the running offset (clamped on overflow).
    off = jnp.minimum(offset, P - 2 * C)
    next_fields = jax.lax.dynamic_update_slice(next_fields, packed, (0, off))
    next_lane = jax.lax.dynamic_update_slice(next_lane, packed_lane, (off,))
    new_offset = jnp.minimum(offset + n_children, P - 2 * C)
    n_dropped = offset + n_children - new_offset  # children lost to overflow

    n_active = jnp.sum(active.astype(jnp.int32))
    return color, white, primary_t, next_fields, next_lane, new_offset, n_active, n_dropped


def render_wavefront(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    chunk: int = DEFAULT_CHUNK,
    pool_capacity: Optional[int] = None,
):
    """Full render; returns dict(image, depth, rays) like ``render_stats``."""
    assert cfg.shading == "bvh", (
        "wavefront pool records carry no medium stack; materials shading "
        "runs on the queue renderer (render_stats)"
    )
    H, W, S = cfg.height, cfg.width, cfg.spp
    B = H * W * S
    accel = _build_accel(scene, cfg)
    o, d, _, _ = _lane_inputs(camera, cfg)

    chunk = min(chunk, -(-B // 128) * 128)
    # Pool: multiple of chunk, big enough for all primaries + one chunk slack.
    P = pool_capacity or (-(-(B + 2 * chunk) // chunk) * chunk)

    # Accumulators are sized to the pool capacity P (not B) so the round-0
    # dense slice updates never clamp at the edge; the [B:] tail is padding.
    color = jnp.zeros((3, P), jnp.float32)
    white = jnp.zeros((P,), jnp.float32)
    primary_t = jnp.full((P,), cfg.t_max, jnp.float32)

    # Round 0 pool: primary rays as planes, padded to P with lane = -1.
    fields = jnp.zeros((N_FIELDS, P), jnp.float32)
    for i in range(3):
        fields = fields.at[i, :B].set(o[:, i]).at[3 + i, :B].set(d[:, i])
    fields = fields.at[6, :B].set(1.0)
    lane = jnp.full((P,), -1, jnp.int32).at[:B].set(jnp.arange(B, dtype=jnp.int32))
    n = B
    total_rays = jnp.int32(0)
    total_dropped = jnp.int32(0)

    for rnd in range(cfg.max_bounces + 1):
        n_chunks = -(-n // chunk)
        next_fields = jnp.zeros((N_FIELDS, P), jnp.float32)
        next_lane = jnp.full((P,), -1, jnp.int32)
        offset = jnp.int32(0)
        for k in range(n_chunks):
            f = fields[:, k * chunk : (k + 1) * chunk]
            l = lane[k * chunk : (k + 1) * chunk]
            (color, white, primary_t, next_fields, next_lane, offset,
             n_act, n_drop) = _chunk_step(
                color, white, primary_t, next_fields, next_lane, offset,
                scene, accel, lights, f, l, cfg, rnd == 0, P, chunk,
            )
            total_rays = total_rays + n_act  # device-side accumulation
            total_dropped = total_dropped + n_drop
        n = int(offset)  # the single per-round host sync
        if n == 0 or rnd == cfg.max_bounces:
            break
        fields, lane = next_fields, next_lane

    color = jnp.where(white > 0.0, 1.0, color)  # emissive abort -> pure white
    colors = jnp.moveaxis(color[:, :B], 0, -1).reshape(H, W, S, 3)
    out = finalize(colors, primary_t[:B].reshape(H, W, S), cfg)
    out["rays"] = total_rays
    out["rays_dropped"] = total_dropped
    return out
