"""Tiled progressive rendering with the reference's spiral schedule.

The reference's alternative driver renders K tiles per frame, walking tiles
in a spiral outward from the image center so the fovea refines first
(``In-Next-Week/base2.h:329-381``, ``materials.cpp:85-120``: ring corners +
steps state, one ``glDispatchCompute`` per tile with a ``u_ImgOffset``
uniform).  Here the spiral is a precomputed order; each step traces the
pixels of the next K tiles and writes them into a persistent canvas — a
progressive preview loop for interactive use (the analogue of the
reference's redraw-per-frame UI), while the mesh path
(``parallel/render_sharded``) remains the throughput path.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.ops.render import (
    Lights,
    RenderConfig,
    _build_accel,
    _lane_inputs,
    trace_lanes,
)
from raytracing_tests_tpu.scene.types import Camera, Scene


import functools

import jax


@functools.partial(jax.jit, static_argnames=("cfg",))
def _tile_trace(scene, lights, cfg, o, d, tr, si, accel):
    """One jitted tile program, MODULE-LEVEL so its jit cache survives
    across render_progressive calls (recompiled per distinct edge-tile
    shape only) — the eager per-tile trace paid a tunneled dispatch per
    op (PERFORMANCE.md fact 45)."""
    color, _, _, _ = trace_lanes(scene, lights, cfg, o, d, tr, si, accel)
    S = cfg.spp
    hw = o.shape[0] // S
    return jnp.mean(
        jnp.sqrt(jnp.maximum(color.reshape(hw, S, 3), 0.0)), axis=1)


def spiral_tile_order(nx: int, ny: int) -> np.ndarray:
    """Tile indices (k, 2) spiraling outward from the grid center.

    Reproduces the reference's ring walk: start at the center tile, then for
    ring r = 1, 2, ... visit the ring's tiles in ring order, skipping tiles
    outside the grid (``base2.h:329-381``).
    """
    cx, cy = (nx - 1) / 2.0, (ny - 1) / 2.0
    tiles = [(x, y) for y in range(ny) for x in range(nx)]
    # ring index = Chebyshev distance from center; stable angular order inside
    def key(t):
        x, y = t
        ring = max(abs(x - cx), abs(y - cy))
        ang = np.arctan2(y - cy, x - cx)
        return (round(ring * 2) / 2, ang)

    return np.asarray(sorted(tiles, key=key), dtype=np.int32)


def render_progressive(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    tile: Tuple[int, int] = (64, 64),
    tiles_per_step: int = 4,
) -> Iterator[dict]:
    """Yield dict(image, done_fraction) after each batch of spiral tiles.

    ``image`` is the full canvas with untraced tiles still black — exactly
    the reference's progressive fill-in look.
    """
    H, W, S = cfg.height, cfg.width, cfg.spp
    tw, th = tile
    nx, ny = -(-W // tw), -(-H // th)
    order = spiral_tile_order(nx, ny)

    accel = _build_accel(scene, cfg)
    o, d, time_ratio, sample_idx = _lane_inputs(camera, cfg)
    o = o.reshape(H, W, S, 3)
    d = d.reshape(H, W, S, 3)
    time_ratio = time_ratio.reshape(H, W, S)
    sample_idx = sample_idx.reshape(H, W, S)

    canvas = np.zeros((H, W, 3), np.float32)
    done = 0
    for batch_start in range(0, len(order), tiles_per_step):
        for tx, ty in order[batch_start : batch_start + tiles_per_step]:
            x0, y0 = int(tx) * tw, int(ty) * th
            x1, y1 = min(x0 + tw, W), min(y0 + th, H)
            hh, ww = y1 - y0, x1 - x0
            flat = lambda a: a[y0:y1, x0:x1].reshape(hh * ww * S, *a.shape[3:])
            tile_img = _tile_trace(scene, lights, cfg, flat(o), flat(d),
                                   flat(time_ratio), flat(sample_idx),
                                   accel)
            canvas[y0:y1, x0:x1] = np.asarray(tile_img).reshape(hh, ww, 3)
            done += 1
        yield {"image": canvas.copy(), "done_fraction": done / (nx * ny)}
