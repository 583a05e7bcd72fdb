#!/usr/bin/env python
"""bvh1k (1,025-object generic grid) on-chip tuning: one variant per
process (UBER_ABLATE is read at import/trace time).

Usage: python scripts/tune_bvh1k.py <tag> [gr] [L] [R]
Prints Mrays/s plus the kernel's own occupancy diagnostics
(iterations, sweep-groups-entered per iteration)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from _bench_util import run

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "base"
    gr = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    R = int(sys.argv[4]) if len(sys.argv) > 4 else 96
    s, c = examples.bvh_grid_scene(side=32)
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    tile = os.environ.get("UBER_TILE") or None
    if tile and tile != "auto":
        tile = tuple(int(x) for x in tile.split("x"))
    out = render_uber(s, c, cfg, L=L, R=R, gr=gr, tile=tile)
    iters = int(out["iters"])
    rays = int(out["rays"])
    ge = int(out["groups_entered"])
    print(f"[{tag}] iters={iters} rays={rays} "
          f"occ={iters * L / max(rays, 1):.3f}x "
          f"groups/iter={ge / max(iters, 1):.2f}", flush=True)
    run(f"bvh1k[{tag}|gr{gr}|L{L}|R{R}|tile{tile}]",
        lambda: render_uber(s, c, cfg, L=L, R=R, gr=gr, tile=tile), n=3)


if __name__ == "__main__":
    main()
