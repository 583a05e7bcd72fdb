#!/usr/bin/env python
"""Profile one megaqueue frame; print top device ops by total time."""
import glob
import time
import jax
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.megaqueue import render_mega
from raytracing_tests_tpu.scene import examples


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=12, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    f = lambda: render_mega(scene, cam, cfg, chunk=1 << 20)
    out = f()
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    out = f()
    jax.block_until_ready(out["image"])
    print(f"frame: {time.perf_counter()-t0:.2f}s rays={int(out['rays'])} "
          f"iters={int(out['iterations'])}", flush=True)

    with jax.profiler.trace("/tmp/megaprof"):
        out = f()
        jax.block_until_ready(out["image"])

    pb = sorted(glob.glob("/tmp/megaprof/**/*.xplane.pb", recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(pb)
    tot = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                tot[name] = tot.get(name, 0) + dur
    for name, ns in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ns/1e6:10.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
