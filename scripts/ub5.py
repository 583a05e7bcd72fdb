#!/usr/bin/env python
import dataclasses
import time
import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.scene import examples


def run(tag, scene, cam, cfg, **kw):
    f = lambda s, c: render_uber(s, c, cfg, **kw)
    out = f(scene, cam)
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = f(scene, cam)
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt:.2f}s rays={rays} "
          f"mean={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    # ablation: RI probe off (image wrong; perf-indicative only)
    cfg_nori = dataclasses.replace(cfg, has_dielectrics=False)
    run("ABLATE no-RI     R96 gr64", scene, cam, cfg_nori, L=2048, R=96, gr=64)
    # ablation: queue capacity 2 (cheaper stack ops; some drops)
    cfg_q2 = dataclasses.replace(cfg, queue_capacity=2)
    run("ABLATE qcap2     R96 gr64", scene, cam, cfg_q2, L=2048, R=96, gr=64)
    # tuning
    run("uber R80  gr64", scene, cam, cfg, L=2048, R=80, gr=64)
    run("uber R96  gr56", scene, cam, cfg, L=2048, R=96, gr=56)
    run("uber R96  gr72", scene, cam, cfg, L=2048, R=96, gr=72)


if __name__ == "__main__":
    main()
