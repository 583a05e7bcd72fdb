#!/usr/bin/env python
"""Round-3 regression bisection: one (tag, config) per process; ablations
ride UBER_ABLATE (nocarry | probe | nopack | nokinds | nosuper | flush |
gather1 | trig).

Usage: python scripts/probe_r3b.py {head|bvh1k|motion|texturing|materials|lights}
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
    print(f"{tag}: {dt:.3f}s rays={rays} drop={drop} iters={iters} "
          f"t/iter={dt/max(iters,1)*1e6:.1f}us groups={groups/max(iters,1):.2f}/it "
          f"mean={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


def main():
    what = sys.argv[1]
    abl = os.environ.get("UBER_ABLATE", "")
    print("device:", jax.devices()[0], "ablate:", abl or "-", flush=True)
    lights = None
    L, R, gr, qcap, shading, spp = 2048, 96, 64, 3, "bvh", 16
    if what == "head":
        s, c = examples.iow_final_scene()
        spp = 100
    elif what == "bvh1k":
        s, c = examples.bvh_grid_scene(side=32)  # qcap=3 matches bench.py
    elif what == "motion":
        s, c = examples.motion_blur_scene()
    elif what == "texturing":
        s, c = examples.texturing_scene()
        L = int(os.environ.get("PROBE_L", 1024))
    elif what == "materials":
        s, c = examples.materials_scene()
        shading, qcap = "materials", None
    elif what == "lights":
        s, c = examples.lights_scene()
        lights = extract_lights(s)
        R = 64
    else:
        raise SystemExit(f"unknown: {what}")
    cfg = RenderConfig(width=800, height=450, spp=spp, max_bounces=8,
                       intersector="pallas", shading=shading).for_scene(s)
    run(f"{what}[{abl or 'base'}]",
        lambda: render_uber(s, c, cfg, lights=lights, L=L, R=R, gr=gr,
                            qcap=qcap), L, n=2)


if __name__ == "__main__":
    main()
