#!/usr/bin/env python
"""Sweep-kernel microbenchmark: v1 grouped vs v2 variants on the real chip.

Generates the headline bench's actual ray population (800x450 primaries in
tile order) plus an incoherent shuffled copy (bounce-ray stand-in), and
times each kernel variant standalone.  Run on the TPU.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.camera_rays import primary_rays
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.kernels import sweep, sweep2


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
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--which", default="all")
    args = ap.parse_args()

    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=args.spp).for_scene(scene)
    o, d, tr = primary_rays(cam, cfg.width, cfg.height, cfg.spp)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    tr = tr.reshape(-1)

    from raytracing_tests_tpu.ops.workqueue import tile_order_perm
    perm = tile_order_perm(cfg.width, cfg.height, cfg.spp, 32)
    B = args.rays
    o_t = jnp.asarray(np.asarray(o)[perm][:B])
    d_t = jnp.asarray(np.asarray(d)[perm][:B])
    tr_t = jnp.asarray(np.asarray(tr)[perm][:B])
    rng = np.random.RandomState(0)
    shuf = rng.permutation(len(perm))[:B]
    o_s = jnp.asarray(np.asarray(o)[shuf])
    d_s = jnp.asarray(np.asarray(d)[shuf])
    tr_s = jnp.asarray(np.asarray(tr)[shuf])
    tlim = jnp.full((B,), 32000.0, jnp.float32)

    results = {}

    def bench(name, fn, *a):
        dt = timeit(fn, *a, iters=args.iters)
        results[name] = dt
        print(f"{name:44s} {dt*1e3:8.2f} ms  {B/dt/1e6:7.1f} Mray-sweeps/s")

    loads = [("tile", o_t, d_t, tr_t), ("shuf", o_s, d_s, tr_s)]

    if args.which in ("all", "v1"):
        a1 = sweep.make_accel(scene, group=32, has_motion=False)
        f1 = jax.jit(lambda o_, d_, t_: sweep.sweep_grouped(
            a1.table, a1.gaabb, o_, d_, t_, tlim, 32, True, has_motion=False))
        for ln, oo, dd, tt in loads:
            bench(f"v1 grouped g32 fused-ri [{ln}]", f1, oo, dd, tt)

    if args.which in ("all", "v2"):
        for gr in (32, 64):
            a2 = sweep2.make_accel2(scene, gr=gr, has_motion=False)
            for mxu in (True, False):
                for blk in (512, 1024, 2048):
                    f2 = jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                                 sweep2.sweep2_full(a2, o_, d_, t_, tlim,
                                                    with_ri=True, use_mxu=mxu,
                                                    block=blk))
                    for ln, oo, dd, tt in loads:
                        bench(f"v2 gr{gr} mxu={int(mxu)} L{blk} [{ln}]",
                              f2, oo, dd, tt)

    if args.which in ("all", "v2occ"):
        a2 = sweep2.make_accel2(scene, gr=64, has_motion=False)
        f3 = jax.jit(lambda o_, d_, t_: sweep2.sweep2_nearest(
            a2, o_, d_, t_, tlim, use_mxu=True, block=1024))
        for ln, oo, dd, tt in loads:
            bench(f"v2 occl gr64 L1024 [{ln}]", f3, oo, dd, tt)


if __name__ == "__main__":
    main()


def extra():
    import sys
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=16).for_scene(scene)
    o, d, tr = primary_rays(cam, cfg.width, cfg.height, cfg.spp)
    o, d, tr = o.reshape(-1, 3), d.reshape(-1, 3), tr.reshape(-1)
    from raytracing_tests_tpu.ops.workqueue import tile_order_perm
    perm = tile_order_perm(cfg.width, cfg.height, cfg.spp, 32)
    B = 1 << 20
    o_t, d_t, tr_t = (jnp.asarray(np.asarray(x)[perm][:B]) for x in (o, d, tr))
    rng = np.random.RandomState(0)
    shuf = rng.permutation(len(perm))[:B]
    o_s, d_s, tr_s = (jnp.asarray(np.asarray(x)[shuf]) for x in (o, d, tr))
    tlim = jnp.full((B,), 32000.0, jnp.float32)
    for gr, blk, ri in [(64, 2048, False), (128, 2048, True), (64, 4096, True),
                        (128, 4096, True)]:
        a2 = sweep2.make_accel2(scene, gr=gr, has_motion=False)
        f = jax.jit(lambda o_, d_, t_, a2=a2, ri=ri, blk=blk: sweep2.sweep2_full(
            a2, o_, d_, t_, tlim, with_ri=ri, use_mxu=True, block=blk))
        for ln, oo, dd, tt in [("tile", o_t, d_t, tr_t), ("shuf", o_s, d_s, tr_s)]:
            dt = timeit(f, oo, dd, tt, iters=5)
            print(f"v2 gr{gr} L{blk} ri={int(ri)} [{ln}]  {dt*1e3:8.2f} ms  {B/dt/1e6:7.1f} Mray/s")
