#!/usr/bin/env python
"""Round-4 A/B: tile="auto" (compact-footprint raygen) vs scanline order,
same-window per config (PERFORMANCE.md fact 24: back-to-back or nothing).

VERDICT r3 items 2/3: the spp=16 side configs pay ~2x per iteration because
a round's 2048 lanes span ~128 scanline pixels; tile="auto" shrinks the
round footprint ~sqrt-fold.  Also measured here: the headline at 100 spp
(item 2's mean-margin lever) and bvh1k (item 1's coherence component).

Usage: python scripts/tune_r4.py [config ...]   (default: all)
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._bench_util import run  # noqa: E402  (sets the compile cache)
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def run2(tag, fn, L, n=3):
    out = fn()
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    drop = int(out.get("rays_dropped", 0))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out["image"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    iters = int(out["iters"])
    groups = int(out["groups_entered"])
    ideal = rays / L
    print(f"{tag}: best={dt:.3f}s mean={sum(times)/n:.3f}s rays={rays} "
          f"drop={drop} iters={iters} (x{iters/ideal:.2f}) "
          f"groups={groups/iters:.2f}/iter "
          f"img={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)
    return rays / dt / 1e6


def main():
    print("device:", jax.devices()[0], flush=True)
    which = set(sys.argv[1:]) or {"headline", "bvh1k", "texturing", "lights",
                                  "materials", "motion"}

    mk16 = lambda s, **kw: RenderConfig(
        width=800, height=450, spp=16, max_bounces=8,
        intersector="pallas", **kw).for_scene(s)

    if "headline" in which:
        s, c = examples.iow_final_scene()
        cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                           intersector="pallas").for_scene(s)
        for tile in (None, "auto"):
            run2(f"headline tile={tile}",
                 lambda t=tile: render_uber(s, c, cfg, L=2048, R=96, gr=64,
                                            qcap=3, tile=t), 2048)

    if "bvh1k" in which:
        s, c = examples.bvh_grid_scene(side=32)
        cfg = mk16(s)
        for tile in (None, "auto"):
            run2(f"bvh1k tile={tile}",
                 lambda t=tile: render_uber(s, c, cfg, L=2048, R=96, gr=64,
                                            qcap=3, tile=t), 2048)

    if "texturing" in which:
        s, c = examples.texturing_scene()
        cfg = mk16(s)
        for tile in (None, "auto"):
            run2(f"texturing tile={tile}",
                 lambda t=tile: render_uber(s, c, cfg, L=1024, R=96, gr=64,
                                            qcap=3, tile=t), 1024)

    if "lights" in which:
        s, c = examples.lights_scene()
        cfg = mk16(s)
        lt = extract_lights(s)
        for tile in (None, "auto"):
            run2(f"lights tile={tile}",
                 lambda t=tile: render_uber(s, c, cfg, lights=lt, L=2048,
                                            R=64, gr=64, qcap=3, tile=t),
                 2048)

    if "materials" in which:
        s, c = examples.materials_scene()
        cfg = mk16(s, shading="materials")
        for tile in (None, "auto"):
            run2(f"materials tile={tile}",
                 lambda t=tile: render_uber(s, c, cfg, L=2048, R=96, gr=64,
                                            tile=t), 2048)

    if "motion" in which:
        s, c = examples.motion_blur_scene()
        cfg = mk16(s)
        for tile in (None, "auto"):
            run2(f"motion-uber tile={tile}",
                 lambda t=tile: render_uber(s, c, cfg, L=2048, R=96, gr=64,
                                            qcap=3, tile=t), 2048)


if __name__ == "__main__":
    main()
