#!/usr/bin/env python
"""In-process uber-vs-queue routing A/B for the side bench configs
(VERDICT r4 item 3).  Same protocol as scripts/ab.py: compile both, then
alternate frames inside one process/chip state — cross-process chip
timings cannot A/B anything (PERFORMANCE.md fact 37).

Usage: python scripts/ab_route.py [lights texturing materials motion ...]
       [n=5]
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._bench_util import run  # noqa: E402,F401  (compile cache)
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import (RenderConfig, extract_lights,
                                             render_stats)
from raytracing_tests_tpu.scene import examples

CHUNK = 1048576


def make_config(which):
    lights = None
    kws = {}
    # Per-config uber tunes from the round-4 ladders (bench.py routing).
    uber_kw = dict(L=2048, R=96, gr=64, qcap=3)
    if which == "motion":
        s, c = examples.motion_blur_scene()
    elif which == "lights":
        s, c = examples.lights_scene()
        lights = extract_lights(s)
        uber_kw.update(R=64)
    elif which == "materials":
        s, c = examples.materials_scene()
        kws["shading"] = "materials"
        uber_kw.update(qcap=None)
    elif which == "texturing":
        s, c = examples.texturing_scene()
        uber_kw.update(R=64, L=1024)
    elif which == "bvh1k":
        s, c = examples.bvh_grid_scene(side=32)
    else:
        raise SystemExit(f"unknown config {which}")
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       lane_chunk=CHUNK, intersector="pallas",
                       **kws).for_scene(s)
    return s, c, cfg, lights, uber_kw


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("n=")]
    n = next((int(a[2:]) for a in sys.argv[1:] if a.startswith("n=")), 5)
    if not names:
        names = ["lights", "texturing", "materials"]
    for which in names:
        s, c, cfg, lights, uber_kw = make_config(which)
        queue_fn = jax.jit(lambda s_, c_, lt: render_stats(s_, c_, cfg, lt))

        def uber():
            return render_uber(s, c, cfg, lights=lights, **uber_kw)

        def queue():
            return queue_fn(s, c, lights)

        variants = {"uber": uber, "queue": queue}
        outs = {}
        for name, fn in variants.items():
            out = fn()
            jax.block_until_ready(out["image"])
            outs[name] = out
            print(f"warm {which}/{name}: rays={int(out['rays'])}", flush=True)
        times = {name: [] for name in variants}
        for _ in range(n):
            for name, fn in variants.items():
                t0 = time.perf_counter()
                out = fn()
                jax.block_until_ready(out["image"])
                times[name].append(time.perf_counter() - t0)
        for name in variants:
            rays = int(outs[name]["rays"])
            ts = times[name]
            print(f"AB {which} {name}: best={min(ts):.3f}s "
                  f"med={sorted(ts)[len(ts)//2]:.3f}s "
                  f"img={float(np.asarray(outs[name]['image']).mean()):.4f} "
                  f"-> {rays/min(ts)/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
