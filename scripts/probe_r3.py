#!/usr/bin/env python
"""Round-3 one-shot on-chip probe: one (tag, config) per process.

Usage: python scripts/probe_r3.py <what>
  head        headline base (L2048 R96 gr64 q3)
  head-mxu    headline with use_mxu=True (MXU HIGHEST DC/OC dots)
  motion      motion config on uber (gr clamps to 8 for capacity-8 scenes)
  texturing   texturing config on uber (in-kernel atlas sampling)
  materials   materials config on uber
  lights      lights config on uber (R=64)
Ablations ride UBER_ABLATE (flush | probe | gather1 | trig) with 'head'.
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def run(tag, fn, L, n=3):
    out = fn()
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    drop = int(out.get("rays_dropped", 0))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / n
    iters = int(out["iters"])
    groups = int(out["groups_entered"])
    ideal = rays / L
    print(f"{tag}: {dt:.3f}s rays={rays} drop={drop} iters={iters} "
          f"(x{iters/ideal:.2f} ideal) groups={groups} "
          f"({groups/max(iters,1):.2f}/iter) "
          f"mean={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


def main():
    what = sys.argv[1]
    abl = os.environ.get("UBER_ABLATE", "")
    print("device:", jax.devices()[0], "ablate:", abl or "-", flush=True)
    if what.startswith("head"):
        s, c = examples.iow_final_scene()
        cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                           intersector="pallas").for_scene(s)
        mxu = what == "head-mxu"
        run(f"{what}[{abl or 'base'}]",
            lambda: render_uber(s, c, cfg, L=2048, R=96, gr=64, qcap=3,
                                use_mxu=mxu), 2048)
        return
    lights = None
    L, R, gr, qcap, shading = 2048, 96, 64, 3, "bvh"
    if what == "motion":
        s, c = examples.motion_blur_scene()
    elif what == "texturing":
        s, c = examples.texturing_scene()
        L, R = int(os.environ.get("PROBE_L", 1024)), 96
    elif what == "materials":
        s, c = examples.materials_scene()
        shading, qcap = "materials", None
    elif what == "lights":
        s, c = examples.lights_scene()
        lights = extract_lights(s)
        R = 64
    else:
        raise SystemExit(f"unknown: {what}")
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas", shading=shading).for_scene(s)
    run(f"{what}", lambda: render_uber(s, c, cfg, lights=lights, L=L, R=R,
                                       gr=gr, qcap=qcap), L, n=2)


if __name__ == "__main__":
    main()
