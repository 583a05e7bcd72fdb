#!/usr/bin/env python
"""Occupancy / culling diagnostics for the persistent kernel: per-block
while-loop iterations (occupancy = rays / (iters * L)) and sweep groups
entered per iteration (culling effectiveness)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def diag(tag, scene, cam, cfg, **kw):
    out = render_uber(scene, cam, cfg, **kw)
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    iters = int(out["iters"])
    groups = int(out["groups_entered"])
    L = kw.get("L", 2048)
    print(f"{tag}: rays={rays} iters={iters} occupancy="
          f"{rays / (iters * L):.3f} groups/iter={groups / iters:.2f}",
          flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)
    diag("headline(8 groups)", s, c, cfg, L=2048, R=96, gr=64, qcap=3)

    s, c = examples.bvh_grid_scene(side=32)
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    diag("bvh1k(17 groups)", s, c, cfg, L=2048, R=96, gr=64, qcap=3)


if __name__ == "__main__":
    main()
