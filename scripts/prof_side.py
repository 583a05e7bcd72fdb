#!/usr/bin/env python
"""Side-config (motion / lights / materials / texturing / headline) probe —
one variant per invocation (env ablations are read at trace time).

The spp=16 side configs are 1-group scenes: there is no culling to win
(tile="auto" measured NEGATIVE, round 4), so the levers are per-iteration
FIXED costs — lane width L (amortization of (1, L)-plane ops and taken
branches), R (output-tile VMEM), and the straight-line ablations
(slflow / slshade).

Usage: python scripts/prof_side.py CONFIG TAG [L R gr]
"""
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._bench_util import run  # noqa: E402  (compile cache)
from scripts.tune_r4 import run2  # noqa: E402
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def main():
    which = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "base"
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    R = int(sys.argv[4]) if len(sys.argv) > 4 else 96
    gr = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    lights = None
    kw = {}
    spp = 16
    if which == "motion":
        s, c = examples.motion_blur_scene()
    elif which == "lights":
        s, c = examples.lights_scene()
        # UBER_NOLIGHTS=1: timing decomposition — drop the emissive list
        # (no shadow sweeps, no paint-it-white abort).  Image is wrong;
        # the delta vs the lit run isolates the per-light cost.
        if not int(os.environ.get("UBER_NOLIGHTS", "0")):
            lights = extract_lights(s)
    elif which == "materials":
        s, c = examples.materials_scene()
        kw["shading"] = "materials"
    elif which == "texturing":
        s, c = examples.texturing_scene()
    else:
        s, c = examples.iow_final_scene()
        spp = 100
    cfg = RenderConfig(width=800, height=450, spp=spp, max_bounces=8,
                       intersector="pallas", **kw).for_scene(s)
    qcap = None if which == "materials" else 3
    order = os.environ.get("UBER_ORDER", "sample")
    run2(f"{which} {tag} L{L} R{R} gr{gr}",
         lambda: render_uber(s, c, cfg, lights=lights, L=L, R=R, gr=gr,
                             qcap=qcap, order=order), L)


if __name__ == "__main__":
    main()
