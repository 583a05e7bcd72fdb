#!/usr/bin/env python
"""One-shot decomposed sweep2 benchmark: setup once, measure many variants."""
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
    t0 = time.time()
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=16).for_scene(scene)
    o, d, tr = primary_rays(cam, cfg.width, cfg.height, cfg.spp)
    o, d, tr = o.reshape(-1, 3), d.reshape(-1, 3), tr.reshape(-1)
    from raytracing_tests_tpu.ops.workqueue import tile_order_perm
    perm = np.asarray(tile_order_perm(cfg.width, cfg.height, cfg.spp, 32))
    B = 1 << 20
    on, dn_, tn = np.asarray(o), np.asarray(d), np.asarray(tr)
    o_t = jnp.asarray(on[perm][:B]); d_t = jnp.asarray(dn_[perm][:B]); tr_t = jnp.asarray(tn[perm][:B])
    rng = np.random.RandomState(0)
    shuf = rng.permutation(len(perm))[:B]
    o_s = jnp.asarray(on[shuf]); d_s = jnp.asarray(dn_[shuf]); tr_s = jnp.asarray(tn[shuf])
    tlim = jnp.full((B,), 32000.0, jnp.float32)
    loads = [("tile", o_t, d_t, tr_t), ("shuf", o_s, d_s, tr_s)]
    accels = {gr: sweep2.make_accel2(scene, gr=gr, has_motion=False)
              for gr in (32, 64, 128)}
    jax.block_until_ready(accels[32].otab)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    def bench(name, fn):
        for ln, oo, dd, tt in loads:
            dt = timeit(fn, oo, dd, tt)
            print(f"{name} [{ln}] {dt*1e3:8.2f} ms  {B/dt/1e6:7.1f} Mray/s",
                  flush=True)

    for mxu in (False, True):
        for gr in (32, 64, 128):
            a2 = accels[gr]
            for blk in (1024, 2048, 4096):
                bench(f"sweep  gr{gr:<3} mxu{int(mxu)} L{blk:<4}",
                      jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                              sweep2.sweep2_nearest(a2, o_, d_, t_, tlim,
                                                    use_mxu=mxu, block=blk)))
            blk = 2048
            bench(f"full   gr{gr:<3} mxu{int(mxu)} L{blk:<4}",
                  jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                          sweep2.sweep2_full(a2, o_, d_, t_, tlim,
                                             with_ri=False, use_mxu=mxu,
                                             block=blk)))
            bench(f"fullri gr{gr:<3} mxu{int(mxu)} L{blk:<4}",
                  jax.jit(lambda o_, d_, t_, a2=a2, mxu=mxu, blk=blk:
                          sweep2.sweep2_full(a2, o_, d_, t_, tlim,
                                             with_ri=True, use_mxu=mxu,
                                             block=blk)))


if __name__ == "__main__":
    main()
