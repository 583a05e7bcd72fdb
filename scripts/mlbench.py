#!/usr/bin/env python
"""megalanes e2e benchmark on the chip."""
import sys
import time
import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.megalanes import render_megalanes
from raytracing_tests_tpu.scene import examples


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=spp, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    for chunk, gr in ((1 << 20, 32), (1 << 21, 32), (1 << 20, 128)):
        f = lambda s, c: render_megalanes(s, c, cfg, chunk=chunk, gr=gr)
        out = f(scene, cam)
        jax.block_until_ready(out["image"])
        rays = int(out["rays"])
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            out = f(scene, cam)
        jax.block_until_ready(out["image"])
        dt = (time.perf_counter() - t0) / n
        print(f"megalanes spp{spp} chunk{chunk>>20}M gr{gr}: {dt:.2f}s "
              f"rays={rays} iters={int(out['iterations'])} "
              f"dropped={int(out['rays_dropped'])} "
              f"mean={float(np.asarray(out['image']).mean()):.4f} "
              f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
