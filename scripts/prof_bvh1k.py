#!/usr/bin/env python
"""bvh1k (1,025-object generic grid) profile battery — one variant per
invocation (env ablations are read at trace time).

Usage: python scripts/prof_bvh1k.py TAG [L R gr] [side]
Env: UBER_ABLATE / UBER_SPAN_G set by the caller.
"""
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._bench_util import run  # noqa: E402  (compile cache)
from scripts.tune_r4 import run2  # noqa: E402
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "base"
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    gr = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    side = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    s, c = examples.bvh_grid_scene(side=side)
    mb = int(os.environ.get("UBER_MB", "8"))  # divergence probe: fewer
    # bounces -> fewer scattered secondaries -> tighter group culling
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=mb,
                       intersector="pallas").for_scene(s)
    qcap = int(os.environ.get("UBER_QCAP", "3"))
    order = os.environ.get("UBER_ORDER", "sample")
    run2(f"bvh{side * side} {tag} L{L} R{R} gr{gr}",
         lambda: render_uber(s, c, cfg, L=L, R=R, gr=gr, qcap=qcap,
                             order=order), L)


if __name__ == "__main__":
    main()
