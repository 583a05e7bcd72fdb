#!/usr/bin/env python
"""End-to-end megaqueue benchmark + glue-cost decomposition on the chip."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.megaqueue import render_mega, _init_slab, _drain
from raytracing_tests_tpu.kernels.mega import mega_step, POOL_ROWS
from raytracing_tests_tpu.kernels.sweep2 import make_accel2
from raytracing_tests_tpu.ops.render import _lane_inputs
from raytracing_tests_tpu.scene import examples


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(scene)

    # Standalone kernel cost on a real primary chunk.
    C = 1 << 20
    o, d, tr, _ = _lane_inputs(cam, cfg)
    accel = make_accel2(scene, gr=32, has_motion=cfg.has_motion)
    pool, lane = _init_slab(o[:C], d[:C], tr[:C], cfg, C, C)
    args = (accel.otab, accel.ftab3, accel.gaabb, pool[:, :C], lane[:C], 32,
            cfg.has_motion, cfg.has_dielectrics, cfg.spp, cfg.max_bounces,
            cfg.t_max, cfg.background)
    out = mega_step(*args, block=2048)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = mega_step(*args, block=2048)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"mega_step C=1M gr32 L2048: {dt*1e3:.2f} ms = {C/dt/1e6:.1f} Mray/s",
          flush=True)

    for gr in (32, 128):
        f = lambda s, c: render_mega(s, c, cfg, chunk=1 << 20, gr=gr)
        out = f(scene, cam)
        jax.block_until_ready(out["image"])
        rays = int(out["rays"])
        iters = int(out["iterations"])
        t0 = time.perf_counter()
        for _ in range(2):
            out = f(scene, cam)
        jax.block_until_ready(out["image"])
        dt = (time.perf_counter() - t0) / 2
        print(f"mega e2e gr{gr}: {dt:.2f} s  rays={rays}  iters={iters} "
              f"dropped={int(out['rays_dropped'])} "
              f"mean={float(np.asarray(out['image']).mean()):.4f} "
              f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
