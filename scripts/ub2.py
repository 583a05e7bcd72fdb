#!/usr/bin/env python
import time
import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.scene import examples


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    for L, R, gr in ((2048, 64, 32), (4096, 64, 32), (2048, 64, 64),
                     (2048, 128, 32), (1024, 64, 32)):
        try:
            f = lambda s, c: render_uber(s, c, cfg, L=L, R=R, gr=gr)
            out = f(scene, cam)
            jax.block_until_ready(out["image"])
            rays = int(out["rays"])
            t0 = time.perf_counter()
            n = 2
            for _ in range(n):
                out = f(scene, cam)
            jax.block_until_ready(out["image"])
            dt = (time.perf_counter() - t0) / n
            print(f"uber L{L} R{R} gr{gr}: {dt:.2f}s rays={rays} "
                  f"dropped={int(out['rays_dropped'])} "
                  f"mean={float(np.asarray(out['image']).mean()):.4f} "
                  f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)
        except Exception as e:
            print(f"uber L{L} R{R} gr{gr}: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
