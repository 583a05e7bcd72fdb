#!/usr/bin/env python
"""Headline benchmark: Mrays/s/chip on the In-One-Weekend final scene.

BASELINE.md metric: Mrays/s/chip at 800x450x100spp (the reference publishes
no numbers — SURVEY.md §6 — so the target derives from BASELINE.json's
north star: >= 1 Grays/s aggregate on a v4-16, i.e. 62.5 Mrays/s/chip).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s/chip", "vs_baseline": N}

Env knobs:
  BENCH_SMOKE=1     tiny config for CI/CPU smoke runs
  BENCH_CHUNK=N     lanes per lax.map step (peak-memory bound)
  BENCH_SPP=N       override samples per pixel
"""

import json
import os
import time

import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig, render_stats
from raytracing_tests_tpu.scene import examples

BASELINE_MRAYS_PER_CHIP = 62.5  # 1 Grays/s / 16 chips (BASELINE.md)


def main():
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    if smoke:
        width, height, spp = 80, 45, 4
        scene, camera = examples.materials_scene()
        chunk = int(os.environ.get("BENCH_CHUNK", 16384))
    else:
        width, height, spp = 800, 450, int(os.environ.get("BENCH_SPP", 100))
        scene, camera = examples.iow_final_scene()
        chunk = int(os.environ.get("BENCH_CHUNK", 1048576))

    cfg = RenderConfig(
        width=width,
        height=height,
        spp=spp,
        max_bounces=8,
        lane_chunk=chunk,
        intersector=os.environ.get("BENCH_INTERSECTOR", "pallas"),
    ).for_scene(scene)
    renderer = os.environ.get("BENCH_RENDERER", "queue")

    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    if renderer == "mega":
        from raytracing_tests_tpu.ops.megaqueue import render_mega

        fn = lambda s, c: render_mega(s, c, cfg, chunk=chunk)
    elif renderer == "workqueue":
        from raytracing_tests_tpu.ops.workqueue import render_workqueue

        fn = lambda s, c: render_workqueue(s, c, cfg, chunk=chunk)
    elif renderer == "wavefront":
        from raytracing_tests_tpu.ops.wavefront import render_wavefront

        fn = lambda s, c: render_wavefront(s, c, cfg, chunk=chunk)
    else:
        fn = jax.jit(lambda s, c: render_stats(s, c, cfg))

    # Compile + warm up.
    out = fn(scene, camera)
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])

    n_iters = 1 if smoke else 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(scene, camera)
        jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / n_iters

    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"Mrays/s/chip {'smoke' if smoke else 'iow-final'} {width}x{height}x{spp}spp d{cfg.max_bounces}",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 3),
            }
        )
    )
    # Diagnostics on stderr-adjacent lines are not allowed (one JSON line);
    # stash extras in a side file for the curious.
    with open("bench_details.json", "w") as f:
        json.dump(
            {
                "rays_per_frame": rays,
                "seconds_per_frame": dt,
                "device": str(jax.devices()[0]),
                "platform": jax.devices()[0].platform,
                "lane_chunk": chunk,
                "renderer": renderer,
                "intersector": cfg.intersector,
                "mean_image": float(np.asarray(out["image"]).mean()),
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
