"""Gradient-based scene optimization (inverse rendering).

The training loop the reference never had: render -> L2 loss vs a target
image -> gradients w.r.t. ``SceneParams`` -> optax update.  On a mesh, the
forward is row-sharded (``parallel/render_sharded.py``) and the parameter
gradients are automatically ``psum``-reduced over the ``rows`` axis by the
``shard_map`` transpose — the TPU-native gradient all-reduce of SURVEY.md
§2.6, riding ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from raytracing_tests_tpu.diff.params import SceneParams, apply_params, extract_params
from raytracing_tests_tpu.ops.render import Lights, RenderConfig, render
from raytracing_tests_tpu.parallel.render_sharded import render_sharded
from raytracing_tests_tpu.scene.types import Camera, Scene


def render_loss(
    params: SceneParams,
    template: Scene,
    camera: Camera,
    cfg: RenderConfig,
    target,
    mesh: Optional[Mesh] = None,
    lights: Optional[Lights] = None,
):
    """Mean-squared pixel error of the (possibly sharded) render vs target."""
    from raytracing_tests_tpu.diff.fastpath import fastpath_eligible

    if cfg.soft_edges > 0.0 and cfg.intersector != "pallas":
        # No other path implements the estimator — silently ignoring the
        # flag would hand back exactly the biased silhouette gradients it
        # exists to fix.
        raise ValueError(
            "soft_edges requires the Pallas fast gradient path "
            "(intersector='pallas'); both scene modes are supported")
    if fastpath_eligible(cfg):
        # Fast gradient path: detached Pallas winner-finding + closed-form
        # recompute of the winner's hit (diff/fastpath.py) — both scene
        # modes.  early_exit off: while_loop is not
        # reverse-differentiable, the scan bounce loop is.
        cfg = dataclasses.replace(cfg, early_exit=False, diff_mode=True)
    elif cfg.early_exit or cfg.intersector in ("pallas", "bvh"):
        # while_loop is not reverse-differentiable (bvh traversal uses
        # one); gradient rendering falls back to the scan + dense-sweep
        # formulation (identical outputs, tested).
        cfg = dataclasses.replace(
            cfg,
            early_exit=False,
            intersector="brute" if cfg.intersector in ("pallas", "bvh") else cfg.intersector,
        )
    scene = apply_params(template, params)
    if mesh is not None:
        out = render_sharded(scene, camera, cfg, mesh, lights)
    else:
        out = render(scene, camera, cfg, lights)
    return jnp.mean((out["image"] - target) ** 2)


@struct.dataclass
class TrainState:
    params: SceneParams
    opt_state: optax.OptState
    step: jnp.ndarray

    @classmethod
    def create(cls, scene: Scene, optimizer: optax.GradientTransformation):
        params = extract_params(scene)
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    template: Scene,
    camera: Camera,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    lights: Optional[Lights] = None,
    trainable: Optional[SceneParams] = None,
):
    """Build the jitted full training step: value_and_grad -> optax update.

    Returns ``step(state, target) -> (state, loss)``.  This is the function
    the driver's multi-chip dry run compiles over an N-device mesh.

    ``trainable`` optionally masks which parameter leaves update (a
    ``SceneParams`` of 0/1 arrays or scalars).  Autodiff through the renderer
    differentiates the smooth shading branches only; silhouette
    (visibility-edge) jumps are invisible to it, so geometry parameters see
    biased gradients near edges — freeze or down-weight them when optimizing
    appearance, or render with more spp so edge pixels are a smaller fraction.
    """

    @jax.jit
    def step(state: TrainState, target):
        loss, grads = jax.value_and_grad(render_loss)(
            state.params, template, camera, cfg, target, mesh, lights
        )
        if trainable is not None:
            grads = jax.tree.map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return step
