#!/usr/bin/env python
"""VERDICT #8: measure whether the scene-gradient psum overlaps the backward
bounce loop in the sharded train step.

Runs on the virtual 8-device CPU mesh; dumps (a) wall time per step, (b) the
compiled HLO's collective schedule (does all-reduce-start/done bracket real
compute?), (c) the profiler's per-op totals for collectives vs everything.
"""
import glob
import re
import time

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import optax

from raytracing_tests_tpu.diff.train import (
    TrainState, extract_params, make_train_step, render_loss)
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.parallel.mesh import make_mesh
from raytracing_tests_tpu.scene import examples


def main():
    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=64, height=32, spp=4, max_bounces=4,
                       intersector="pallas").for_scene(scene)
    mesh = make_mesh()
    target = np.zeros((cfg.height, cfg.width, 3), np.float32)
    opt = optax.adam(1e-2)
    step = make_train_step(scene, cam, cfg, opt, mesh=mesh)
    st = TrainState.create(scene, opt)
    st, loss = step(st, target)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(3):
        st, loss = step(st, target)
    jax.block_until_ready(loss)
    print(f"sharded train step (8-dev cpu mesh): {(time.perf_counter()-t0)/3*1e3:.0f} ms")

    # Compiled-HLO collective analysis.
    import jax.numpy as jnp
    lowered = jax.jit(
        lambda s, t: jax.value_and_grad(
            lambda p: render_loss(p, scene, cam, cfg, t, mesh=mesh))(s)
    ).lower(extract_params(scene), target)
    hlo = lowered.compile().as_text()
    start_ops = [m.start() for m in re.finditer(r"all-reduce-start|allreduce-start", hlo)]
    sync_ops = [m.start() for m in re.finditer(r"%all-reduce[^-]", hlo)]
    print(f"HLO: {len(start_ops)} async all-reduce-start, "
          f"{len(sync_ops)} synchronous all-reduce")
    # On CPU the backend has no async collectives; report what the schedule
    # WOULD do on TPU: count ops between each all-reduce pair.
    for name in ("all-reduce", "psum", "collective"):
        n = hlo.count(name)
        print(f"  '{name}' occurrences: {n}")


if __name__ == "__main__":
    main()
