#!/usr/bin/env python
"""Profile one queue-renderer frame; print top device ops by total time."""
import glob
import time
import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig, render_stats
from raytracing_tests_tpu.scene import examples


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=12, max_bounces=8,
                       lane_chunk=1 << 20, intersector="pallas").for_scene(scene)
    f = jax.jit(lambda s, c: render_stats(s, c, cfg))
    out = f(scene, cam)
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    out = f(scene, cam)
    jax.block_until_ready(out["image"])
    print(f"frame: {time.perf_counter()-t0:.2f}s rays={int(out['rays'])}",
          flush=True)

    with jax.profiler.trace("/tmp/queueprof"):
        out = f(scene, cam)
        jax.block_until_ready(out["image"])

    pb = sorted(glob.glob("/tmp/queueprof/**/*.xplane.pb", recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(pb)
    tot = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] = tot.get(ev.name, 0) + ev.duration_ns
    for name, ns in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ns/1e6:10.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
