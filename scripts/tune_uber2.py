#!/usr/bin/env python
"""On-chip tuning sweep for the round-2b persistent-kernel coverage:
headline sanity (qcap3), generic bvh1k (L/R/gr), lights, motion."""
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(__file__))
from _bench_util import run

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def main():
    print("device:", jax.devices()[0], flush=True)

    # Headline sanity at qcap3 (the bench configuration).
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)
    run("headline R96 gr64 q3",
        lambda: render_uber(s, c, cfg, L=2048, R=96, gr=64, qcap=3))

    # Generic 1k-object grid (the bvh1k bench config), parameter scan.
    s, c = examples.bvh_grid_scene(side=32)
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    for L, R, gr in ((2048, 96, 64), (2048, 96, 128), (2048, 48, 64),
                     (1024, 96, 64)):
        run(f"bvh1k L{L} R{R} gr{gr}",
            lambda L=L, R=R, gr=gr: render_uber(s, c, cfg, L=L, R=R, gr=gr,
                                                qcap=3), n=2)

    # Lights (Cornell) and motion configs.
    s, c = examples.lights_scene()
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    lt = extract_lights(s)
    run("lights R96 gr64",
        lambda: render_uber(s, c, cfg, lights=lt, L=2048, R=96, gr=64,
                            qcap=3), n=2)

    s, c = examples.motion_blur_scene()
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    run("motion R96 gr64",
        lambda: render_uber(s, c, cfg, L=2048, R=96, gr=64, qcap=3), n=2)


if __name__ == "__main__":
    main()
