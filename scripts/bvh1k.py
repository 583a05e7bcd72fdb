#!/usr/bin/env python
"""VERDICT #10: LBVH traversal vs grouped sweep at 1k+ objects, on chip."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig, render_stats
from raytracing_tests_tpu.scene import examples


def bench(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.0f} ms/frame rays={rays} "
          f"-> {rays/dt/1e6:.1f} Mrays/s "
          f"mean={float(np.asarray(out['image']).mean()):.4f}", flush=True)
    return dt


def main():
    scene, cam = examples.bvh_grid_scene(side=32)  # 1,025 objects
    base = RenderConfig(width=400, height=225, spp=4, max_bounces=4,
                        lane_chunk=1 << 19)
    import dataclasses
    for isect, groups in (("pallas", 32), ("pallas", 0), ("bvh", 0)):
        cfg = dataclasses.replace(
            base.for_scene(scene), intersector=isect, pallas_groups=groups)
        f = jax.jit(lambda s, c, cfg=cfg: render_stats(s, c, cfg))
        try:
            bench(f"bvh1k {isect} groups={groups}", f, scene, cam)
        except Exception as e:
            print(f"bvh1k {isect} groups={groups}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
