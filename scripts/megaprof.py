#!/usr/bin/env python
"""Profile one persistent-megakernel frame; print top device ops by time.

Env knobs: PROF_SPP (default 12), PROF_SCENE (iow | motion | bvh1k |
texturing | lights | materials), PROF_L / PROF_R / PROF_GR / PROF_QCAP.
"""
import glob
import os
import time
import jax
import numpy as np

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def main():
    name = os.environ.get("PROF_SCENE", "iow")
    shading = "bvh"
    lights = None
    if name == "iow":
        scene, cam = examples.iow_final_scene()
    elif name == "motion":
        scene, cam = examples.motion_blur_scene()
    elif name == "bvh1k":
        scene, cam = examples.bvh_grid_scene(side=32)
    elif name == "texturing":
        scene, cam = examples.texturing_scene()
    elif name == "lights":
        scene, cam = examples.lights_scene()
        lights = extract_lights(scene)
    else:
        scene, cam = examples.materials_scene()
        shading = "materials"
    spp = int(os.environ.get("PROF_SPP", 12))
    cfg = RenderConfig(width=800, height=450, spp=spp, max_bounces=8,
                       intersector="pallas", shading=shading).for_scene(scene)
    L = int(os.environ.get("PROF_L", 2048))
    R = int(os.environ.get("PROF_R", 96))
    gr = int(os.environ.get("PROF_GR", 64))
    qcap = int(os.environ.get("PROF_QCAP", 0)) or None
    f = lambda: render_uber(scene, cam, cfg, lights=lights, L=L, R=R, gr=gr,
                            qcap=qcap)
    out = f()
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    out = f()
    jax.block_until_ready(out["image"])
    dt = time.perf_counter() - t0
    rays = int(out["rays"])
    print(f"frame: {dt:.2f}s rays={rays} {rays/dt/1e6:.2f} Mrays/s "
          f"iters={int(out['iters'])} groups={int(out['groups_entered'])} "
          f"dropped={int(out['rays_dropped'])}", flush=True)

    with jax.profiler.trace("/tmp/megaprof"):
        out = f()
        jax.block_until_ready(out["image"])

    pb = sorted(glob.glob("/tmp/megaprof/**/*.xplane.pb", recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(pb)
    tot = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                tot[name] = tot.get(name, 0) + dur
    for name, ns in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ns/1e6:10.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
