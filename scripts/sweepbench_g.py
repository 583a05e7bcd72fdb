#!/usr/bin/env python
"""Standalone generic-sweep A/B: time sweep2g_nearest on the bvh1k scene's
primary rays, outside the persistent kernel (discriminates sweep-body cost
from uber plumbing)."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_tests_tpu.kernels.sweep2g import make_accel2g, sweep2g_nearest
from raytracing_tests_tpu.ops.camera_rays import primary_rays
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def main():
    s, c = examples.bvh_grid_scene(side=32)
    cfg = RenderConfig(width=800, height=450, spp=4, max_bounces=1,
                       intersector="pallas").for_scene(s)
    accel = make_accel2g(s, gr=64, has_motion=cfg.has_motion,
                         sort_origin=np.asarray(c.position).reshape(-1)[:3],
                         probe_rows=cfg.probe_rows)
    o, d, tr = primary_rays(c, 800, 450, 4)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    tr = tr.reshape(-1)
    tl = jnp.full((o.shape[0],), 1e6, jnp.float32)

    def run():
        t, obj = sweep2g_nearest(accel, o, d, tr, tl)
        return t, obj

    t, obj = jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(5):
        t, obj = run()
    jax.block_until_ready(t)
    dt = (time.perf_counter() - t0) / 5
    B = o.shape[0]
    hits = int((np.asarray(obj) >= 0).sum())
    print(f"sweep2g {B} rays: {dt*1e3:.1f} ms -> {B/dt/1e6:.1f} Mrays/s "
          f"(hits {hits}, mean t {float(np.asarray(t)[np.asarray(obj)>=0].mean()):.3f})",
          flush=True)


if __name__ == "__main__":
    main()
