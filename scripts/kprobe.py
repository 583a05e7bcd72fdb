#!/usr/bin/env python
"""Correctness probes for sweep2 kernel variants on the real chip.

1. use_mxu=1 winner parity vs use_mxu=0 (the Mosaic sliced-K padding story).
2. One-hot gather at Precision.HIGH (3-pass) vs HIGHEST (6-pass) exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.ops.camera_rays import primary_rays
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.kernels import sweep2


def main():
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=1).for_scene(scene)
    o, d, tr = primary_rays(cam, cfg.width, cfg.height, cfg.spp)
    B = 1 << 18
    o = o.reshape(-1, 3)[:B]
    d = d.reshape(-1, 3)[:B]
    tr = tr.reshape(-1)[:B]
    tlim = jnp.full((B,), 32000.0, jnp.float32)

    accel = sweep2.make_accel2(scene, gr=64, has_motion=False)

    t0, obj0 = sweep2.sweep2_nearest(accel, o, d, tr, tlim, use_mxu=False)
    t1, obj1 = sweep2.sweep2_nearest(accel, o, d, tr, tlim, use_mxu=True)
    t0, obj0, t1, obj1 = map(np.asarray, (t0, obj0, t1, obj1))
    mism = (obj0 != obj1).sum()
    tdiff = np.abs(np.where(obj0 >= 0, t0, 0) - np.where(obj1 >= 0, t1, 0)).max()
    print(f"mxu winner mismatches: {mism}/{B}  max|t diff|: {tdiff:.3e}")

    # Split-gather exactness: 3x bf16 DEFAULT passes vs the true rows.
    fhi, fmid, flo = accel.ftab3
    ftab = (fhi.astype(jnp.float32) + fmid.astype(jnp.float32)
            + flo.astype(jnp.float32))
    n_pad = ftab.shape[1]
    idx = jnp.arange(2048, dtype=jnp.int32) % n_pad
    oh = (jnp.arange(n_pad)[:, None] == idx[None, :]).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    got = sum(
        jax.lax.dot_general(part, oh, dn, preferred_element_type=jnp.float32)
        for part in (fhi, fmid, flo))
    exact = np.asarray(ftab)[:, np.asarray(idx)]
    print(f"split-gather max err: {np.abs(np.asarray(got) - exact).max():.3e}")


if __name__ == "__main__":
    main()
