#!/usr/bin/env python
"""Object-count scaling curve for the generic persistent kernel (VERDICT r2
#3): bvh grid at side 32/64/100 -> 1,025 / 4,097 / 10,001 objects, same
camera/resolution, reporting Mrays/s, us/iter, and groups-entered/iter —
the sub-linearity evidence for the two-level (super-group) culling.

Usage: python scripts/scale_curve.py [side ...]  (default 32 64 100)
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def main():
    sides = [int(x) for x in sys.argv[1:]] or [32, 64, 100]
    print("device:", jax.devices()[0], flush=True)
    for side in sides:
        s, c = examples.bvh_grid_scene(side=side)
        n = side * side + 1
        cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                           intersector="pallas").for_scene(s)
        ok = False
        for L, R in ((2048, 96), (2048, 48), (1024, 48)):
            try:
                fn = lambda: render_uber(s, c, cfg, L=L, R=R, gr=64, qcap=3)
                out = fn()
                jax.block_until_ready(out["image"])
                ok = True
                break
            except Exception as e:
                print(f"side{side} L{L} R{R}: {type(e).__name__} "
                      f"(VMEM?) — retrying smaller", flush=True)
        if not ok:
            print(f"side{side}: no config fit", flush=True)
            continue
        rays = int(out["rays"])
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out["image"])
        dt = time.perf_counter() - t0
        iters = int(out["iters"])
        groups = int(out["groups_entered"])
        n_groups = -(-n // 64)
        print(f"side{side} n={n} (G={n_groups}) L{L} R{R}: {dt:.3f}s "
              f"rays={rays} drop={int(out['rays_dropped'])} "
              f"t/iter={dt/max(iters,1)*1e6:.1f}us "
              f"groups={groups/max(iters,1):.2f}/it of {n_groups} "
              f"rows/ray={groups/max(iters,1)*64/2:.0f} "
              f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
