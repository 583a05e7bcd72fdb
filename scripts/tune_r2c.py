#!/usr/bin/env python
"""Round-2c on-chip sweep: headline margin (L/R/gr/mxu), lights VMEM fit,
motion renderer choice (queue won at 95 vs uber's 29 in the r2b run)."""
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _bench_util import run

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
from raytracing_tests_tpu.scene import examples


def main():
    print("device:", jax.devices()[0], flush=True)
    which = set(sys.argv[1:]) or {"headline", "lights", "motion"}

    if "headline" in which:
        s, c = examples.iow_final_scene()
        cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                           intersector="pallas").for_scene(s)
        for L, R, gr, mxu in (
            (2048, 96, 64, False),   # current bench config
            (2048, 64, 64, False),
            (2048, 128, 64, False),
            (2048, 96, 32, False),
            (2048, 96, 96, False),
            (4096, 48, 64, False),
            (1024, 192, 64, False),
            (2048, 96, 64, True),
        ):
            try:
                run(f"headline L{L} R{R} gr{gr} mxu{int(mxu)}",
                    lambda L=L, R=R, gr=gr, mxu=mxu: render_uber(
                        s, c, cfg, L=L, R=R, gr=gr, use_mxu=mxu, qcap=3),
                    n=3)
            except Exception as e:
                print(f"headline L{L} R{R} gr{gr}: FAIL {type(e).__name__}",
                      flush=True)

    if "lights" in which:
        s, c = examples.lights_scene()
        cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                           intersector="pallas").for_scene(s)
        lt = extract_lights(s)
        for L, R in ((2048, 48), (2048, 64), (1024, 96)):
            try:
                run(f"lights L{L} R{R}",
                    lambda L=L, R=R: render_uber(s, c, cfg, lights=lt, L=L,
                                                 R=R, gr=64, qcap=3), n=2)
            except Exception as e:
                print(f"lights L{L} R{R}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    if "motion" in which:
        from raytracing_tests_tpu.ops.render import render_stats

        s, c = examples.motion_blur_scene()
        cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                           intersector="pallas").for_scene(s)
        fq = jax.jit(lambda: render_stats(s, c, cfg, None))
        run("motion queue", lambda: fq(), n=3)
        for L, R in ((2048, 96), (2048, 32)):
            run(f"motion uber L{L} R{R}",
                lambda L=L, R=R: render_uber(s, c, cfg, L=L, R=R, gr=64,
                                             qcap=3), n=3)


if __name__ == "__main__":
    main()
