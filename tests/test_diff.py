"""Differentiable-rendering tests: gradient finiteness, finite-difference
parity on smooth (appearance) parameters, and end-to-end inverse-rendering
recovery — the BASELINE.json "pixel-grad allclose" requirement."""

import dataclasses

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.diff import (
    TrainState,
    extract_params,
    make_train_step,
    params_mask,
    render_loss,
)
from raytracing_tests_tpu.ops.render import RenderConfig, render_jit
from raytracing_tests_tpu.parallel import make_mesh
from raytracing_tests_tpu.scene import examples


@pytest.fixture(scope="module")
def setup():
    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=24, height=16, spp=2, max_bounces=3)
    target = np.asarray(render_jit(scene, cam, cfg)["image"])
    return scene, cam, cfg, target


def test_all_gradients_finite(setup):
    scene, cam, cfg, target = setup
    pert = scene.replace(color=scene.color * 0.6 + 0.2)
    p = extract_params(pert)
    g = jax.grad(render_loss)(p, pert, cam, cfg, target)
    for f in dataclasses.fields(g):
        v = getattr(g, f.name)
        if v is None:
            continue
        assert bool(jnp.all(jnp.isfinite(v))), f"non-finite grads in {f.name}"


def test_banded_grads_match_full(setup):
    """Row-band gradient accumulation (banded_value_and_grad) == the
    full-frame value_and_grad — the loss is a pixel mean, so band SSE sums
    reconstruct it exactly (memory shape of BASELINE-scale training)."""
    from raytracing_tests_tpu.diff import banded_value_and_grad

    scene, cam, cfg, target = setup
    cfg = dataclasses.replace(cfg, intersector="pallas").for_scene(scene)
    pert = scene.replace(color=scene.color * 0.6 + 0.2)
    p = extract_params(pert)
    loss_f, g_f = jax.value_and_grad(render_loss)(p, pert, cam, cfg, target)
    vg = jax.jit(banded_value_and_grad(pert, cam, cfg, grad_bands=4))
    loss_b, g_b = vg(p, jnp.asarray(target))
    np.testing.assert_allclose(float(loss_b), float(loss_f), rtol=1e-6)
    for f in dataclasses.fields(g_f):
        a, b = getattr(g_f, f.name), getattr(g_b, f.name)
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-7, err_msg=f.name)


@pytest.mark.parametrize(
    "field,index",
    [
        ("color", (0, 0)),
        ("color", (1, 2)),
        ("reflectivity", (2,)),
        ("refractivity", (1,)),
        ("refractive_index", (1,)),
    ],
)
def test_grad_matches_finite_difference(setup, field, index):
    """Appearance parameters are smooth: autodiff == central finite diff."""
    scene, cam, cfg, target = setup
    pert = scene.replace(color=scene.color * 0.6 + 0.2)
    p = extract_params(pert)
    g = jax.grad(render_loss)(p, pert, cam, cfg, target)

    eps = 1e-3

    def loss_with(delta):
        arr = getattr(p, field).at[index].add(delta)
        return float(render_loss(p.replace(**{field: arr}), pert, cam, cfg, target))

    fd = (loss_with(eps) - loss_with(-eps)) / (2 * eps)
    ad = float(getattr(g, field)[index])
    assert np.isclose(ad, fd, rtol=5e-2, atol=1e-7), (field, index, ad, fd)


def test_sharded_grads_match_single_device(setup):
    """The shard_map transpose's gradient psum must be exact."""
    scene, cam, cfg, target = setup
    pert = scene.replace(color=scene.color * 0.6 + 0.2)
    p = extract_params(pert)
    g1 = jax.grad(render_loss)(p, pert, cam, cfg, target)
    g8 = jax.jit(jax.grad(render_loss), static_argnames=("cfg", "mesh"))(
        p, pert, cam, cfg, target, make_mesh(8)
    )
    for f in dataclasses.fields(g1):
        a, b = getattr(g1, f.name), getattr(g8, f.name)
        if a is None:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=f.name)


def test_inverse_rendering_recovers_albedo(setup):
    scene, cam, cfg, target = setup
    pert = scene.replace(color=scene.color * 0.6 + 0.2)
    opt = optax.adam(2e-2)
    step = make_train_step(
        pert, cam, cfg, opt, mesh=make_mesh(8), trainable=params_mask(pert, "color")
    )
    st = TrainState.create(pert, opt)
    first = None
    for _ in range(40):
        st, loss = step(st, target)
        first = float(loss) if first is None else first
    assert float(loss) < first * 0.05, (first, float(loss))


def test_grad_wrt_geometry_descends(setup):
    """Position/scale grads are biased at silhouettes but must still descend
    for small interior perturbations."""
    scene, cam, cfg, target = setup
    pert = scene.replace(position=scene.position.at[0, 1].add(0.05))
    p = extract_params(pert)
    loss0 = float(render_loss(p, pert, cam, cfg, target))
    g = jax.grad(render_loss)(p, pert, cam, cfg, target)
    stepped = p.replace(position=p.position - 0.02 * g.position / (1e-8 + jnp.abs(g.position).max()))
    loss1 = float(render_loss(stepped, pert, cam, cfg, target))
    assert loss1 < loss0, (loss0, loss1)


# ---------------------------------------------------------------------------
# Round 2: fast Pallas gradient path (diff/fastpath.py) + edge-aware grads
# ---------------------------------------------------------------------------


def test_pallas_diff_grads_match_brute(setup):
    """Winner-recompute gradients == dense-sweep gradients on every field."""
    scene, cam, cfg, target = setup
    cfg = cfg.for_scene(scene)
    assert cfg.pallas_mode == "spheres"
    pert = scene.replace(color=scene.color * 0.6 + 0.2)
    p = extract_params(pert)
    gb = jax.grad(render_loss)(
        p, pert, cam, dataclasses.replace(cfg, intersector="brute"), target
    )
    gp = jax.grad(render_loss)(
        p, pert, cam, dataclasses.replace(cfg, intersector="pallas"), target
    )
    for f in dataclasses.fields(gb):
        a, b = getattr(gb, f.name), getattr(gp, f.name)
        if a is None:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, err_msg=f.name
        )


@pytest.mark.parametrize("field,index", [("position", (1, 1)), ("scale", (1, 0))])
def test_soft_edge_grad_matches_fd_through_silhouette(setup, field, index):
    """With soft_edges on, AD == FD for GEOMETRY params whose dominant loss
    response runs through a visible silhouette (the hard renderer's autodiff
    misses this term entirely)."""
    scene, cam, cfg, target = setup
    cfg = dataclasses.replace(
        cfg.for_scene(scene), intersector="pallas", soft_edges=0.03
    )
    pert = scene.replace(position=scene.position.at[1, 0].add(0.08))
    p = extract_params(pert)
    g = jax.grad(render_loss)(p, pert, cam, cfg, target)

    eps = 1e-5  # small: FD must sample the smooth band, not candidate swaps
    def loss_with(delta):
        arr = getattr(p, field).at[index].add(delta)
        return float(render_loss(p.replace(**{field: arr}), pert, cam, cfg, target))

    fd = (loss_with(eps) - loss_with(-eps)) / (2 * eps)
    ad = float(getattr(g, field)[index])
    assert np.isclose(ad, fd, rtol=1.5e-1, atol=1e-6), (field, index, ad, fd)


def test_soft_edges_recover_displaced_sphere(setup):
    """Inverse rendering with position trainable: the soft-edge estimator
    must pull a displaced sphere back toward the target (the hard
    renderer's position grads cannot see the silhouette move)."""
    scene, cam, cfg, target = setup
    cfg = dataclasses.replace(
        cfg.for_scene(scene), intersector="pallas", soft_edges=0.05
    )
    pert = scene.replace(position=scene.position.at[1, 0].add(0.12))
    opt = optax.adam(2e-2)
    step = make_train_step(
        pert, cam, cfg, opt, trainable=params_mask(pert, "position")
    )
    st = TrainState.create(pert, opt)
    err0 = float(jnp.abs(st.params.position[1, 0] - scene.position[1, 0]))
    for _ in range(30):
        st, loss = step(st, target)
    err1 = float(jnp.abs(st.params.position[1, 0] - scene.position[1, 0]))
    assert err1 < 0.5 * err0, (err0, err1)


@pytest.fixture(scope="module")
def generic_setup():
    """A rotated-cuboid scene whose loss is silhouette-dominated: one box
    over a matte ground, camera square-on."""
    from raytracing_tests_tpu.scene.types import Camera, SceneBuilder

    b = SceneBuilder()
    b.add_box((0.0, 0.0, -4.0), (0.9, 0.9, 0.9),
              rotation_deg=(0.0, 35.0, 0.0), color=(0.85, 0.3, 0.2),
              reflectivity=0.6, scatter_reflect=0.4)
    b.add_sphere((0.0, -100.6, -4.0), 100.0, color=(0.6, 0.6, 0.6),
                 reflectivity=0.5, scatter_reflect=0.9)
    scene = b.build()
    cam = Camera.make((0.0, 0.3, 0.5), (0.0, -0.05, -1.0), fov_y_deg=55.0,
                      focus_dist=4.5)
    cfg = RenderConfig(width=24, height=16, spp=2, max_bounces=3)
    target = np.asarray(render_jit(scene, cam, cfg)["image"])
    return scene, cam, cfg, target


@pytest.mark.parametrize("field,index", [("position", (0, 0)),
                                         ("scale", (0, 1))])
def test_soft_edge_grad_generic_matches_fd(generic_setup, field, index):
    """Round-3: the edge-aware estimator extends to GENERIC geometry —
    AD == FD through a rotated cuboid's silhouette (the rotated-frame
    Chebyshev coverage in diff/fastpath.intersect_diff)."""
    scene, cam, cfg, target = generic_setup
    cfg = dataclasses.replace(
        cfg.for_scene(scene), intersector="pallas", soft_edges=0.03)
    assert cfg.pallas_mode == "generic"
    pert = scene.replace(position=scene.position.at[0, 0].add(0.07))
    p = extract_params(pert)
    g = jax.grad(render_loss)(p, pert, cam, cfg, target)

    eps = 1e-5
    def loss_with(delta):
        arr = getattr(p, field).at[index].add(delta)
        return float(render_loss(p.replace(**{field: arr}), pert, cam, cfg,
                                 target))

    fd = (loss_with(eps) - loss_with(-eps)) / (2 * eps)
    ad = float(getattr(g, field)[index])
    assert np.isclose(ad, fd, rtol=1.5e-1, atol=1e-6), (field, index, ad, fd)


def test_soft_edges_recover_displaced_box(generic_setup):
    """Inverse rendering on a GENERIC scene: the soft-edge estimator pulls
    a displaced rotated box back toward the target."""
    scene, cam, cfg, target = generic_setup
    cfg = dataclasses.replace(
        cfg.for_scene(scene), intersector="pallas", soft_edges=0.05)
    pert = scene.replace(position=scene.position.at[0, 0].add(0.12))
    opt = optax.adam(2e-2)
    step = make_train_step(
        pert, cam, cfg, opt, trainable=params_mask(pert, "position"))
    st = TrainState.create(pert, opt)
    err0 = float(jnp.abs(st.params.position[0, 0] - scene.position[0, 0]))
    for _ in range(30):
        st, loss = step(st, target)
    err1 = float(jnp.abs(st.params.position[0, 0] - scene.position[0, 0]))
    assert err1 < 0.5 * err0, (err0, err1)


def test_generic_fast_gradients_match_dense():
    """Generic-mode (rotated cuboids + spheres) fast gradient path —
    detached sweep2g winner-finding + closed-form recompute — must match
    the dense-sweep gradients for color and interior position."""
    from raytracing_tests_tpu.ops.render import render
    from raytracing_tests_tpu.scene import examples

    scene, cam = examples.bvh_grid_scene(side=4)
    base = RenderConfig(width=32, height=24, spp=2, max_bounces=4,
                        intersector="pallas").for_scene(scene)
    assert base.pallas_mode == "generic"
    cfg_fast = dataclasses.replace(base, diff_mode=True, early_exit=False)
    cfg_dense = dataclasses.replace(base, intersector="brute",
                                    early_exit=False)

    def mk(cfg, field):
        def loss(val):
            out = render(scene.replace(**{field: val}), cam, cfg)
            return jnp.mean(out["image"])
        return loss

    for field in ("color", "position"):
        gf = jax.grad(mk(cfg_fast, field))(getattr(scene, field))
        gd = jax.grad(mk(cfg_dense, field))(getattr(scene, field))
        scale = float(jnp.abs(gd).max()) + 1e-8
        assert float(jnp.abs(gf - gd).max()) / scale < 2e-3, field
        assert bool(jnp.isfinite(gf).all()), field


def test_pixel_grad_allclose_vs_cpu_ref():
    """The BASELINE metric, literally: per-pixel d(image)/d(theta) from
    autodiff must allclose central finite differences of the INDEPENDENT
    CPU oracle renderer (reference/cpu_renderer.py) — not just of the JAX
    renderer itself.  Covers an albedo channel and a dielectric's
    refractive index (the refraction chain)."""
    from raytracing_tests_tpu.ops.render import render
    from raytracing_tests_tpu.reference.cpu_renderer import render_cpu
    from raytracing_tests_tpu.scene import examples

    scene, cam = examples.materials_scene()
    cfg = dataclasses.replace(
        RenderConfig(width=24, height=16, spp=2, max_bounces=4,
                     intersector="brute").for_scene(scene),
        early_exit=False)

    def check(field, index, eps, atol):
        base = float(getattr(scene, field)[index])

        def img_of(v):
            arr = getattr(scene, field).at[index].set(v)
            return render(scene.replace(**{field: arr}), cam, cfg)["image"]

        _, g_ad = jax.jvp(img_of, (base,), (1.0,))

        def cpu_img(v):
            arr = getattr(scene, field).at[index].set(v)
            s = scene.replace(**{field: arr})
            return np.asarray(render_cpu(s, cam, cfg)["image"])

        g_fd = (cpu_img(base + eps) - cpu_img(base - eps)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_ad), g_fd, atol=atol)

    check("color", (2, 0), 2e-3, 2e-2)
    check("refractive_index", (1,), 1e-3, 5e-2)


def test_probed_grad_pops_is_exact():
    """auto_pops (round 5): the probed reverse-scan length must reproduce
    the full-budget loss AND gradients exactly — the cut steps only pop
    empty queues (probe_max_pops measures the early-exit forward's true
    max tree depth)."""
    import jax.numpy as jnp

    from raytracing_tests_tpu.diff import (banded_value_and_grad,
                                           extract_params, probe_max_pops)

    scene, cam = examples.iow_final_scene(side=4)
    cfg = RenderConfig(width=32, height=24, spp=2, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    pops = probe_max_pops(scene, cam, cfg)
    assert 0 < pops < cfg.pops  # the probe must actually cut (17 -> ~8)

    target = jnp.zeros((24, 32, 3), jnp.float32)
    p = extract_params(scene.replace(color=scene.color * 0.9))
    full = banded_value_and_grad(scene, cam, cfg, grad_bands=4)(p, target)
    cut = banded_value_and_grad(scene, cam, cfg, grad_bands=4,
                                grad_pops=pops)(p, target)
    assert float(full[0]) == float(cut[0])
    for a, b in zip(jax.tree_util.tree_leaves(full[1]),
                    jax.tree_util.tree_leaves(cut[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_auto_pops_runs():
    import optax

    from raytracing_tests_tpu.diff import (TrainState, make_train_step,
                                           params_mask)
    from raytracing_tests_tpu.ops.render import render

    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=16, height=12, spp=1, max_bounces=6,
                       intersector="pallas").for_scene(scene)
    target = render(scene, cam, cfg)["image"]
    pert = scene.replace(color=scene.color * 0.7)
    opt = optax.adam(1e-2)
    step = make_train_step(pert, cam, cfg, opt, grad_bands=2,
                           auto_pops=True,
                           trainable=params_mask(pert, "color"))
    st = TrainState.create(pert, opt)
    st, l0 = step(st, target)
    st, l1 = step(st, target)
    assert float(l1) < float(l0)


def test_band_pops_buckets_are_exact():
    """Depth-bucketed banded gradients must match the flat scan to float
    accumulation order (the bucket scans are exact per band; only the
    cross-band summation order changes)."""
    import jax.numpy as jnp

    from raytracing_tests_tpu.diff import (banded_value_and_grad,
                                           extract_params, probe_band_pops)

    scene, cam = examples.iow_final_scene(side=4)
    cfg = RenderConfig(width=32, height=24, spp=2, max_bounces=8,
                       intersector="pallas").for_scene(scene)
    bp = probe_band_pops(scene, cam, cfg, grad_bands=4)
    assert len(bp) == 4 and min(bp) >= 1
    target = jnp.zeros((24, 32, 3), jnp.float32)
    p = extract_params(scene.replace(color=scene.color * 0.9))
    full = banded_value_and_grad(scene, cam, cfg, grad_bands=4)(p, target)
    cut = banded_value_and_grad(scene, cam, cfg, grad_bands=4,
                                band_pops=bp)(p, target)
    np.testing.assert_allclose(float(full[0]), float(cut[0]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(full[1]),
                    jax.tree_util.tree_leaves(cut[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_grad_finite_with_negative_trained_color():
    """Regression (round 5): sqrt(maximum(x, 0)) backward is inf * 0 = NaN
    wherever a trained color drives a sample's accumulated channel
    negative — adam walked colors negative 5 steps into recovery and the
    NaN poisoned the optimizer state.  Diff-mode finalize floors the gamma
    at 1e-12 so the clamped branch's gradient is an exact 0."""
    import jax.numpy as jnp

    from raytracing_tests_tpu.diff import banded_value_and_grad, extract_params

    scene, cam = examples.iow_final_scene(side=4)
    cfg = RenderConfig(width=32, height=24, spp=2, max_bounces=6,
                       intersector="pallas").for_scene(scene)
    col = np.asarray(scene.color).copy()
    col[1:6] = -0.05  # well outside the physical domain, as training drifts
    pert = scene.replace(color=col.astype(np.float32))
    p = extract_params(pert)
    target = jnp.zeros((24, 32, 3), jnp.float32)
    loss, g = banded_value_and_grad(pert, cam, cfg, grad_bands=2)(p, target)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(g):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.isfinite(arr).all()


def test_auto_pops_reprobes_when_trees_deepen():
    """Round-5 review: parameter drift can DEEPEN ray trees past the
    probed scan depths — the auto_pops step must re-probe on its cadence
    and rebuild its bucketed scans instead of silently truncating
    gradients.  (Driven by swapping in deep-scene params mid-training:
    gradient flow cannot open a closed spawn gate from exactly 0, but
    checkpoint restores / manual edits / positional drift can.)"""
    import optax

    from raytracing_tests_tpu.diff import (TrainState, extract_params,
                                           make_train_step, params_mask)
    from raytracing_tests_tpu.ops.render import render
    from raytracing_tests_tpu.scene.types import Camera, SceneBuilder

    def build(refl):
        b = SceneBuilder()
        b.add_sphere((0.0, 0.0, -3.0), 1.0, color=(0.8, 0.3, 0.3),
                     reflectivity=refl, scatter_reflect=0.0)
        b.add_box((0.0, -101.0, 0.0), (400.0, 200.0, 400.0),
                  color=(0.4, 0.8, 0.4), reflectivity=refl,
                  scatter_reflect=0.0)
        return b.build()

    cam = Camera.make((0.0, 0.5, 2.0), (0.0, -0.1, -1.0), fov_y_deg=60.0,
                      focus_dist=5.0)
    pert = build(0.0)  # shallow trees: probe sees depth ~1
    cfg = RenderConfig(width=24, height=16, spp=1, max_bounces=6,
                       intersector="pallas").for_scene(build(0.9))
    target = render(build(0.9), cam, cfg)["image"]
    step = make_train_step(pert, cam, cfg, optax.adam(1e-2), grad_bands=2,
                           auto_pops=True,
                           trainable=params_mask(pert, "color"))
    pops0 = list(step.pops_state["band_pops"])
    assert max(pops0) <= 4  # zero-reflectivity probe sees shallow trees
    st = TrainState.create(pert, optax.adam(1e-2))
    for k in range(24):
        st, l = step(st, target)
        assert np.isfinite(float(l))
    # Drift the params to a DEEP-tree regime (mirror world) — e.g. a
    # checkpoint restore or a manual edit mid-run.
    st = TrainState(params=extract_params(build(0.9)),
                    opt_state=st.opt_state, step=st.step)
    st, l = step(st, target)  # step 25: the re-probe cadence fires
    assert np.isfinite(float(l))
    assert max(step.pops_state["band_pops"]) > max(pops0), (
        pops0, step.pops_state["band_pops"])
    st, l = step(st, target)  # and the rebuilt scans keep working
    assert np.isfinite(float(l))
