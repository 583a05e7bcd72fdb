#!/usr/bin/env python
"""Round-3 headline tuning sweep: (L, R, gr, qcap) on the iow-final scene
post-bf16-fix, with the kernel's own occupancy stats (iters,
groups-entered) printed per variant — the ideal iteration count is
rays/L per block, so iters/ideal quantifies dead-lane overhead."""
import os
import sys
import time

import jax
import numpy as np

# Repo root importable when run as `python scripts/tune_r3.py` (do NOT use
# PYTHONPATH: it breaks the axon PJRT plugin discovery on this image).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def run(tag, fn, L, n=3):
    out = fn()
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    drop = int(out.get("rays_dropped", 0))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / n
    iters = int(out["iters"])
    groups = int(out["groups_entered"])
    ideal = rays / L
    print(f"{tag}: {dt:.3f}s rays={rays} drop={drop} iters={iters} "
          f"(x{iters/ideal:.2f} ideal) groups={groups} "
          f"({groups/iters:.2f}/iter) "
          f"mean={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)
    return rays / dt


def main():
    print("device:", jax.devices()[0], flush=True)
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)

    # NOTE: the output tile is (4R, L) f32 — R=192 at L=2048 blows the 16M
    # scoped-VMEM limit (measured: 672K over).
    variants = [
        (2048, 128, 64, 3),
        (4096, 48, 64, 3),
        (4096, 64, 64, 3),
        (1024, 192, 64, 3),
        (2048, 96, 64, 3),
    ]
    for L, R, gr, q in variants:
        run(f"L{L} R{R} gr{gr} q{q}",
            lambda L=L, R=R, gr=gr, q=q: render_uber(
                s, c, cfg, L=L, R=R, gr=gr, qcap=q), L)


if __name__ == "__main__":
    main()
