#!/usr/bin/env python
"""Decomposed sweep2 microbenchmark on the real chip: isolate sweep, gather+
refine, and RI-probe costs across (gr, L, mxu) on tile-coherent and shuffled
ray populations."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.camera_rays import primary_rays
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.kernels import sweep2


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--grs", default="64,128")
    ap.add_argument("--blocks", default="2048")
    ap.add_argument("--mxus", default="0")
    ap.add_argument("--stages", default="sweep,full,fullri")
    args = ap.parse_args()

    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=16).for_scene(scene)
    o, d, tr = primary_rays(cam, cfg.width, cfg.height, cfg.spp)
    o, d, tr = o.reshape(-1, 3), d.reshape(-1, 3), tr.reshape(-1)

    from raytracing_tests_tpu.ops.workqueue import tile_order_perm
    perm = tile_order_perm(cfg.width, cfg.height, cfg.spp, 32)
    B = args.rays
    o_t, d_t, tr_t = (jnp.asarray(np.asarray(x)[perm][:B]) for x in (o, d, tr))
    rng = np.random.RandomState(0)
    shuf = rng.permutation(len(perm))[:B]
    o_s, d_s, tr_s = (jnp.asarray(np.asarray(x)[shuf]) for x in (o, d, tr))
    tlim = jnp.full((B,), 32000.0, jnp.float32)
    loads = [("tile", o_t, d_t, tr_t), ("shuf", o_s, d_s, tr_s)]

    def bench(name, fn, *a):
        dt = timeit(fn, *a, iters=args.iters)
        print(f"{name:40s} {dt*1e3:8.2f} ms  {B/dt/1e6:7.1f} Mray-sweeps/s", flush=True)

    stages = args.stages.split(",")
    for gr in [int(x) for x in args.grs.split(",")]:
        a2 = sweep2.make_accel2(scene, gr=gr, has_motion=False)
        for mxu in [bool(int(x)) for x in args.mxus.split(",")]:
            for blk in [int(x) for x in args.blocks.split(",")]:
                if "sweep" in stages:
                    f = jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                                sweep2.sweep2_nearest(a2, o_, d_, t_, tlim,
                                                      use_mxu=mxu, block=blk))
                    for ln, oo, dd, tt in loads:
                        bench(f"sweep gr{gr} mxu{int(mxu)} L{blk} [{ln}]", f, oo, dd, tt)
                if "full" in stages:
                    f = jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                                sweep2.sweep2_full(a2, o_, d_, t_, tlim,
                                                   with_ri=False, use_mxu=mxu,
                                                   block=blk))
                    for ln, oo, dd, tt in loads:
                        bench(f"full  gr{gr} mxu{int(mxu)} L{blk} [{ln}]", f, oo, dd, tt)
                if "fullri" in stages:
                    f = jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                                sweep2.sweep2_full(a2, o_, d_, t_, tlim,
                                                   with_ri=True, use_mxu=mxu,
                                                   block=blk))
                    for ln, oo, dd, tt in loads:
                        bench(f"fullri gr{gr} mxu{int(mxu)} L{blk} [{ln}]", f, oo, dd, tt)


if __name__ == "__main__":
    main()
