#!/usr/bin/env python
"""Headline-scale gradient-path timing (VERDICT r2 #8).

Times the fast Pallas gradient path (diff/fastpath: detached winner-finding
+ closed-form recompute) on the iow-final scene at a BASELINE-config scale,
and splits forward vs backward by also timing the forward-only loss.

Usage: python scripts/gradbench.py [WxHxSPPxDEPTH] (default 400x225x16x8)
"""
import os
import sys
import time

import jax
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracing_tests_tpu.diff import (
    TrainState, extract_params, make_train_step, render_loss)
from raytracing_tests_tpu.ops.render import RenderConfig, render_jit
from raytracing_tests_tpu.scene import examples


def timeit(tag, fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt:.3f} s", flush=True)
    return dt


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "400x225x16x8"
    W, H, SPP, D = (int(x) for x in spec.split("x"))
    print("device:", jax.devices()[0], "config:", spec, flush=True)
    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_bounces=D,
                       intersector="pallas").for_scene(scene)
    target = np.asarray(render_jit(scene, cam, cfg)["image"])

    pert = scene.replace(color=scene.color * 0.8 + 0.1)
    p = extract_params(pert)

    # Per-band sample budget ~300k: the bounce-scan CARRY (per-lane queue)
    # is saved per pop step for the backward — it, not the band image,
    # bounds memory.  Pick the smallest divisor of H that gets there.
    want = max(1, -(-W * H * SPP // 300_000))
    bands = int(os.environ.get("GRAD_BANDS", "0")) or min(
        (b for b in range(want, H + 1) if H % b == 0), default=H)
    print("grad_bands:", bands, flush=True)
    from raytracing_tests_tpu.diff import banded_value_and_grad

    t_f = None
    if W * H * SPP <= 2_000_000:  # full-frame diff forward OOMs above this
        fwd = jax.jit(lambda p: render_loss(p, pert, cam, cfg, target))
        t_f = timeit("forward loss (fastpath winners + closed-form)",
                     lambda: fwd(p))
    if bands > 1:
        gr = jax.jit(banded_value_and_grad(pert, cam, cfg, grad_bands=bands))
        tj = jax.numpy.asarray(target)
        t_g = timeit("grad step (forward + backward, banded)",
                     lambda: gr(p, tj))
    else:
        gr = jax.jit(jax.grad(lambda p: render_loss(p, pert, cam, cfg, target)))
        t_g = timeit("grad step (forward + backward)", lambda: gr(p))
    if t_f is not None:
        print(f"backward share: {(t_g - t_f):.3f} s "
              f"({(t_g - t_f) / t_g * 100:.0f}% of the grad step)", flush=True)

    opt = optax.adam(1e-2)
    step = make_train_step(pert, cam, cfg, opt, grad_bands=bands)
    st = TrainState.create(pert, opt)

    def one(st=st):
        st2, loss = step(st, target)
        return loss
    timeit("full train step (grad + adam update)", one)


if __name__ == "__main__":
    main()
