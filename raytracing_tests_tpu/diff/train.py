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


def _diff_cfg(cfg: RenderConfig) -> RenderConfig:
    """Gradient-rendering config: validate + route to a differentiable
    formulation (single source of truth for render_loss and the banded
    accumulator)."""
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
        return dataclasses.replace(cfg, early_exit=False, diff_mode=True)
    if cfg.early_exit or cfg.intersector in ("pallas", "bvh"):
        # while_loop is not reverse-differentiable (bvh traversal uses
        # one); gradient rendering falls back to the scan + dense-sweep
        # formulation (identical outputs, tested).
        return dataclasses.replace(
            cfg,
            early_exit=False,
            intersector="brute" if cfg.intersector in ("pallas", "bvh") else cfg.intersector,
        )
    return cfg


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
    cfg = _diff_cfg(cfg)
    scene = apply_params(template, params)
    if mesh is not None:
        out = render_sharded(scene, camera, cfg, mesh, lights)
    else:
        out = render(scene, camera, cfg, lights)
    return jnp.mean((out["image"] - target) ** 2)


def banded_value_and_grad(
    template: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    grad_bands: int = 8,
):
    """Gradient ACCUMULATION over image row bands: ``f(params, target) ->
    (loss, grads)`` identical to ``value_and_grad(render_loss)`` (the MSE
    is a pixel mean, so band sums are exact), at 1/``grad_bands`` the
    backward's peak HBM.

    A full-frame backward at BASELINE scale keeps every bounce level's
    (B, 3) intermediates alive (~400 MB x pops at 800x450x16spp) — banding
    is the TPU-native remat: recompute-free, just smaller live sets.  The
    camera is not trainable, so per-band primary rays are constants and
    the scan carries only the (tiny) SceneParams cotangent."""
    from raytracing_tests_tpu.ops.camera_rays import primary_rays
    from raytracing_tests_tpu.ops.render import _build_accel, finalize, trace_lanes

    cfg = _diff_cfg(cfg)
    H, W, S = cfg.height, cfg.width, cfg.spp
    assert H % grad_bands == 0, (H, grad_bands)
    h = H // grad_bands

    def f(params, target):
        o, d, time_ratio = primary_rays(camera, W, H, S)
        sidx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (H, W, S))
        band = lambda x: x.reshape((grad_bands, h) + x.shape[1:])
        o, d, time_ratio, sidx = (band(x) for x in (o, d, time_ratio, sidx))
        target_b = target.reshape(grad_bands, h, W, 3)

        def band_sse(p, ob, db, rb, sb, tb):
            scene = apply_params(template, p)
            accel = _build_accel(scene, cfg)
            flat = lambda x: x.reshape((h * W * S,) + x.shape[3:])
            color, primary_t, rays, _ = trace_lanes(
                scene, lights, cfg, flat(ob), flat(db), flat(rb), flat(sb),
                accel)
            out = finalize(color.reshape(h, W, S, 3),
                           primary_t.reshape(h, W, S), cfg)
            return jnp.sum((out["image"] - tb) ** 2)

        def body(carry, xs):
            sse, g = carry
            s_b, g_b = jax.value_and_grad(band_sse)(params, *xs)
            return (sse + s_b, jax.tree.map(jnp.add, g, g_b)), None

        zero = (jnp.zeros(()), jax.tree.map(jnp.zeros_like, params))
        (sse, grads), _ = jax.lax.scan(
            body, zero, (o, d, time_ratio, sidx, target_b))
        n = H * W * 3
        return sse / n, jax.tree.map(lambda x: x / n, grads)

    return f


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
    grad_bands: int = 1,
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

    ``grad_bands > 1`` accumulates the gradient over image row bands
    (``banded_value_and_grad``): identical loss/grads, 1/bands the
    backward's peak memory — required for BASELINE-scale frames on one
    chip (single-device only).
    """
    if grad_bands > 1:
        assert mesh is None, "grad_bands composes with single-device only"
        vg = banded_value_and_grad(template, camera, cfg, lights,
                                   grad_bands=grad_bands)

    @jax.jit
    def step(state: TrainState, target):
        if grad_bands > 1:
            loss, grads = vg(state.params, target)
        else:
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
