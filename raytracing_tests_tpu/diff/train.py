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


def probe_max_pops(scene: Scene, camera: Camera, cfg: RenderConfig,
                   lights: Optional[Lights] = None) -> int:
    """Pop steps the deepest ray tree of this (scene, camera, cfg) actually
    needs — the early-exit forward's exit count, measured on the full
    frame (a detached ~0.2 s render at BASELINE scale).

    The gradient path cannot early-exit (reverse-mode needs a static scan
    length), so it otherwise runs the full ``cfg.pops`` budget (17 at
    depth 8) while typical scenes top out at 8-10: a probed scan length
    cuts the gradient step proportionally and is EXACT for this scene —
    the remaining scan steps would process empty queues.  Training moves
    the scene, so ``make_train_step(auto_pops=True)`` adds a +2 margin and
    the caller should re-probe if object topology changes drastically."""
    from raytracing_tests_tpu.ops.render import _build_accel, trace_lanes
    from raytracing_tests_tpu.ops.camera_rays import primary_rays

    cfg = _diff_cfg(cfg)
    cfg = dataclasses.replace(cfg, diff_mode=False, early_exit=True)
    H, W, S = cfg.height, cfg.width, cfg.spp
    o, d, tr = primary_rays(camera, W, H, S)
    sidx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (H, W, S))
    flat = lambda x: x.reshape((-1,) + x.shape[3:])

    @jax.jit
    def probe(scene_, lights_, ob, db, rb, sb):
        accel = _build_accel(scene_, cfg)
        return trace_lanes(scene_, lights_, cfg, flat(ob), flat(db),
                           flat(rb), flat(sb), accel, return_pops=True)[4]

    return int(probe(scene, lights, o, d, tr, sidx))


def probe_band_pops(scene: Scene, camera: Camera, cfg: RenderConfig,
                    grad_bands: int,
                    lights: Optional[Lights] = None) -> list:
    """Per-row-band version of ``probe_max_pops``: the true max ray-tree
    depth of each of ``grad_bands`` bands (one compiled probe reused for
    all bands).  Sky-only bands measure 1; glass-heavy bands run to the
    budget — ``banded_value_and_grad(band_pops=...)`` buckets the
    reverse-mode scans by these so shallow bands stop paying the deepest
    band's scan length (iow-final at 25 bands: mean depth 12.1 vs the
    17-pop budget)."""
    from raytracing_tests_tpu.ops.render import _build_accel, trace_lanes
    from raytracing_tests_tpu.ops.camera_rays import primary_rays

    cfg = _diff_cfg(cfg)
    cfg = dataclasses.replace(cfg, diff_mode=False, early_exit=True)
    H, W, S = cfg.height, cfg.width, cfg.spp
    assert H % grad_bands == 0, (H, grad_bands)
    h = H // grad_bands
    o, d, tr = primary_rays(camera, W, H, S)
    sidx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (H, W, S))

    @jax.jit
    def probe(scene_, lights_, ob, db, rb, sb):
        flat = lambda x: x.reshape((h * W * S,) + x.shape[3:])
        accel = _build_accel(scene_, cfg)
        return trace_lanes(scene_, lights_, cfg, flat(ob), flat(db),
                           flat(rb), flat(sb), accel, return_pops=True)[4]

    out = []
    for b in range(grad_bands):
        sl = slice(b * h, (b + 1) * h)
        out.append(int(probe(scene, lights, o[sl], d[sl], tr[sl], sidx[sl])))
    return out


def banded_value_and_grad(
    template: Scene,
    camera: Camera,
    cfg: RenderConfig,
    lights: Optional[Lights] = None,
    grad_bands: int = 8,
    grad_pops: Optional[int] = None,
    band_pops=None,
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

    import numpy as np

    cfg = _diff_cfg(cfg)
    if grad_pops is not None:
        # Probed scan length (see probe_max_pops): EXACT when >= the
        # scene's true max tree depth — the cut steps only pop empty
        # queues.  cfg.pops clamps it from above.
        cfg = dataclasses.replace(cfg,
                                  max_pops=min(int(grad_pops), cfg.pops))
    H, W, S = cfg.height, cfg.width, cfg.spp
    assert H % grad_bands == 0, (H, grad_bands)
    h = H // grad_bands

    # Depth-bucketed scans (see probe_band_pops): group bands into <= 3
    # buckets by probed depth; each bucket scans its bands at ITS max
    # depth, so sky bands stop paying the glass bands' scan length.
    # Exact per bucket; only the (commutative) accumulation order differs
    # from the flat scan.
    buckets = None
    if band_pops is not None:
        assert len(band_pops) == grad_bands, (len(band_pops), grad_bands)
        caps = np.minimum(np.asarray(band_pops, np.int64), cfg.pops)
        ceilings = sorted(set(int(c) for c in caps))
        while len(ceilings) > 3:  # merge the two closest ceilings
            gaps = np.diff(ceilings)
            i = int(np.argmin(gaps))
            ceilings.pop(i)  # bands under the removed ceiling run deeper
        buckets = []
        prev = 0
        for ceil in ceilings:
            idxs = tuple(int(b) for b in range(grad_bands)
                         if prev < caps[b] <= ceil)
            if idxs:
                buckets.append((int(ceil), idxs))
            prev = ceil

    def f(params, target):
        o, d, time_ratio = primary_rays(camera, W, H, S)
        sidx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (H, W, S))
        band = lambda x: x.reshape((grad_bands, h) + x.shape[1:])
        o, d, time_ratio, sidx = (band(x) for x in (o, d, time_ratio, sidx))
        target_b = target.reshape(grad_bands, h, W, 3)

        def band_sse(cfg_c):
            def g(p, ob, db, rb, sb, tb):
                scene = apply_params(template, p)
                accel = _build_accel(scene, cfg_c)
                flat = lambda x: x.reshape((h * W * S,) + x.shape[3:])
                color, primary_t, rays, _ = trace_lanes(
                    scene, lights, cfg_c, flat(ob), flat(db), flat(rb),
                    flat(sb), accel)
                out = finalize(color.reshape(h, W, S, 3),
                               primary_t.reshape(h, W, S), cfg_c)
                return jnp.sum((out["image"] - tb) ** 2)
            return g

        def scan_bands(cfg_c, carry, xs):
            def body(c, x):
                sse, g = c
                s_b, g_b = jax.value_and_grad(band_sse(cfg_c))(params, *x)
                return (sse + s_b, jax.tree.map(jnp.add, g, g_b)), None
            return jax.lax.scan(body, carry, xs)[0]

        zero = (jnp.zeros(()), jax.tree.map(jnp.zeros_like, params))
        if buckets is None:
            sse, grads = scan_bands(
                cfg, zero, (o, d, time_ratio, sidx, target_b))
        else:
            sse, grads = zero
            for ceil, idxs in buckets:
                sel = np.asarray(idxs)
                cfg_c = dataclasses.replace(cfg, max_pops=ceil)
                sse, grads = scan_bands(
                    cfg_c, (sse, grads),
                    tuple(x[sel] for x in (o, d, time_ratio, sidx,
                                           target_b)))
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
    auto_pops: bool = False,
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

    ``auto_pops`` (banded only): probe each band's true max ray-tree
    depth with the early-exit forward and run the reverse-mode scans at
    those lengths instead of the full ``cfg.pops`` budget — exact for the
    probed scene (the cut steps only pop empty queues), ~1.3x the
    gradient step at depth 8 (``probe_band_pops``).  Training can DEEPEN
    trees (e.g. a zero-reflectivity object turning reflective opens
    spawn gates the probe saw closed), which would silently truncate the
    cut scans — so the returned step RE-PROBES the current params every
    ``reprobe_every`` (25) steps and rebuilds the bucketed scans when any
    band's depth grows past its margin (a host-side retrace, ~once per
    topology change).
    """
    if auto_pops and grad_bands <= 1:
        raise ValueError(
            "auto_pops requires grad_bands > 1 (the probed scan depths "
            "are per row band; pass e.g. grad_bands=8)")
    vg = None
    if grad_bands > 1:
        assert mesh is None, "grad_bands composes with single-device only"
        band_pops = None
        if auto_pops:
            # Probed per-band scan depths + 2-step margin (see docstring).
            band_pops = [p + 2 for p in probe_band_pops(
                template, camera, cfg, grad_bands, lights)]
        vg = banded_value_and_grad(template, camera, cfg, lights,
                                   grad_bands=grad_bands,
                                   band_pops=band_pops)
    vg_box = [vg]  # re-probe (auto_pops) swaps the closure in place

    @jax.jit
    def step(state: TrainState, target):
        if grad_bands > 1:
            loss, grads = vg_box[0](state.params, target)
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

    if not auto_pops:
        return step

    reprobe_every = 25
    pops_state = {"band_pops": band_pops, "since": 0}

    def step_with_reprobe(state: TrainState, target):
        pops_state["since"] += 1
        if pops_state["since"] >= reprobe_every:
            pops_state["since"] = 0
            scene_now = apply_params(template, state.params)
            fresh = probe_band_pops(scene_now, camera, cfg, grad_bands,
                                    lights)
            if any(f > b for f, b in zip(fresh, pops_state["band_pops"])):
                # A band's tree outgrew its margin: rebuild the bucketed
                # scans (one retrace) before it silently truncates.
                pops_state["band_pops"] = [p + 2 for p in fresh]
                vg_box[0] = banded_value_and_grad(
                    template, camera, cfg, lights, grad_bands=grad_bands,
                    band_pops=pops_state["band_pops"])
                step.clear_cache()
        return step(state, target)

    step_with_reprobe.pops_state = pops_state  # test/introspection hook
    return step_with_reprobe
