#!/usr/bin/env python
"""megalanes sorted-schedule benchmark on the chip."""
import time
import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.megalanes import render_megalanes
from raytracing_tests_tpu.scene import examples


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    for sched, gr in (("sorted", 128), ("sorted", 32), ("natural", 128)):
        f = lambda s, c: render_megalanes(s, c, cfg, chunk=1 << 20, gr=gr,
                                          schedule=sched)
        out = f(scene, cam)
        jax.block_until_ready(out["image"])
        rays = int(out["rays"])
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            out = f(scene, cam)
        jax.block_until_ready(out["image"])
        dt = (time.perf_counter() - t0) / n
        print(f"megalanes {sched} gr{gr}: {dt:.2f}s rays={rays} "
              f"iters={int(out['iterations'])} dropped={int(out['rays_dropped'])} "
              f"mean={float(np.asarray(out['image']).mean()):.4f} "
              f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
