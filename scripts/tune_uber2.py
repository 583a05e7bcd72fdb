#!/usr/bin/env python
"""On-chip tuning sweep for the round-2b persistent-kernel coverage:
headline sanity (qcap3), generic bvh1k (L/R/gr), lights, motion.

Run on the real TPU; each run prints Mrays/s from the renderer's own
traced-ray counter with the dropped-ray count (must be 0)."""
import time

import jax
import numpy as np

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def run(tag, scene, cam, cfg, lights=None, n=3, **kw):
    f = lambda: render_uber(scene, cam, cfg, lights=lights, **kw)
    out = f()
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    drop = int(out["rays_dropped"])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt:.3f}s rays={rays} drop={drop} "
          f"mean={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)

    # Headline sanity at qcap3 (the bench configuration).
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)
    run("headline R96 gr64 q3", s, c, cfg, L=2048, R=96, gr=64, qcap=3)

    # Generic 1k-object grid (the bvh1k bench config), parameter scan.
    s, c = examples.bvh_grid_scene(side=32)
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    for L, R, gr in ((2048, 96, 64), (2048, 96, 128), (2048, 48, 64),
                     (1024, 96, 64)):
        run(f"bvh1k L{L} R{R} gr{gr}", s, c, cfg, n=2, L=L, R=R, gr=gr,
            qcap=3)

    # Lights (Cornell) and motion configs.
    s, c = examples.lights_scene()
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    lt = extract_lights(s)
    run("lights R96 gr64", s, c, cfg, lights=lt, n=2, L=2048, R=96, gr=64,
        qcap=3)

    s, c = examples.motion_blur_scene()
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    run("motion R96 gr64", s, c, cfg, n=2, L=2048, R=96, gr=64, qcap=3)


if __name__ == "__main__":
    main()
