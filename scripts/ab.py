#!/usr/bin/env python
"""In-process alternating A/B — the only trustworthy protocol through the
axon tunnel (PERFORMANCE.md fact 24: inter-process dispatch weather is
bimodal at +-25%; a flush-ABLATED run once measured slower than the same
config with the flush).  Variants must be expressible as render_uber
call kwargs (rot via UBER_ROT env is re-read per call; R/L/order/qcap
are jit-static kwargs), so both compile once and frames alternate
A B A B ... inside one process/chip state.

Usage: python scripts/ab.py CONFIG  name=kw:val,kw:val  name=...  [-- n=5]
  e.g. python scripts/ab.py lights rot=rot:1 norot=rot:0 R96=rot:1,R:96
Values are ints unless they contain a letter (then str; 'none' -> None).
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._bench_util import run  # noqa: E402  (compile cache)
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def parse_val(v):
    if v.lower() == "none":
        return None
    try:
        return int(v)
    except ValueError:
        return v


def main():
    which = sys.argv[1]
    n = 5
    variants = []
    for a in sys.argv[2:]:
        if a.startswith("n="):
            n = int(a[2:])
            continue
        name, _, kvs = a.partition("=")
        kw = {}
        for kv in kvs.split(","):
            if not kv:
                continue
            k, _, v = kv.partition(":")
            kw[k] = parse_val(v)
        variants.append((name, kw))

    lights = None
    kws = {}
    spp = 16
    side = int(os.environ.get("AB_SIDE", "32"))
    if which == "motion":
        s, c = examples.motion_blur_scene()
    elif which == "lights":
        s, c = examples.lights_scene()
        lights = extract_lights(s)
    elif which == "materials":
        s, c = examples.materials_scene()
        kws["shading"] = "materials"
    elif which == "texturing":
        s, c = examples.texturing_scene()
    elif which == "bvh1k":
        s, c = examples.bvh_grid_scene(side=side)
    else:
        s, c = examples.iow_final_scene()
        spp = 100
    cfg = RenderConfig(width=800, height=450, spp=spp, max_bounces=8,
                       intersector="pallas", **kws).for_scene(s)
    base_qcap = None if which == "materials" else 3

    def make(kw):
        kw = dict(kw)
        rot = kw.pop("rot", "")  # default: render_uber's spp gate
        abl = kw.pop("abl", None)  # e.g. abl:flush+shadestub
        os.environ["UBER_ROT"] = str(rot)
        try:
            return render_uber(
                s, c, cfg, lights=lights,
                L=kw.pop("L", 2048), R=kw.pop("R", 96),
                gr=kw.pop("gr", 64), qcap=kw.pop("qcap", base_qcap),
                order=kw.pop("order", "sample"),
                ablate=(frozenset(str(abl).split("+"))
                        if abl is not None else frozenset([""])), **kw), rot
        finally:
            del os.environ["UBER_ROT"]

    # Warm (compile) every variant first, then alternate frames.
    outs = {}
    for name, kw in variants:
        out, _ = make(kw)
        jax.block_until_ready(out["image"])
        outs[name] = out
        print(f"warm {name}: rays={int(out['rays'])} "
              f"iters={int(out['iters'])} drop={int(out['rays_dropped'])}",
              flush=True)
    times = {name: [] for name, _ in variants}
    for _ in range(n):
        for name, kw in variants:
            t0 = time.perf_counter()
            out, _ = make(kw)
            jax.block_until_ready(out["image"])
            times[name].append(time.perf_counter() - t0)
    for name, _ in variants:
        out = outs[name]
        rays = int(out["rays"])
        ts = times[name]
        it = int(out["iters"])
        ge = int(out.get("groups_entered", 0))
        print(f"AB {which} {name}: best={min(ts):.3f}s "
              f"med={sorted(ts)[len(ts)//2]:.3f}s "
              f"iters={it} g/iter={ge / max(it, 1):.2f} "
              f"img={float(np.asarray(out['image']).mean()):.4f} "
              f"-> {rays/min(ts)/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
