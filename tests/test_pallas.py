"""Pallas sweep kernels (interpret mode on CPU) + the work-queue and
megakernel renderers: parity with the XLA dense sweep and the queue
renderer."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from raytracing_tests_tpu.kernels.sweep import (
    intersect_pallas,
    make_accel,
    scene_mode,
    surrounding_ri_pallas,
)
from raytracing_tests_tpu.ops.intersect import (
    intersect_brute,
    surrounding_refractive_index,
)
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights, render
from raytracing_tests_tpu.scene import examples

SCENES = {
    "materials": (examples.materials_scene, False),
    "groups": (examples.groups_scene, False),
    "motion": (examples.motion_blur_scene, False),
    "bvh-grid": (lambda: examples.bvh_grid_scene(side=4), False),
    "lights": (examples.lights_scene, True),
}


def _rays(rng, n, spread=6.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_ftab_splits_exact_under_jit():
    """hi + mid + lo must reconstruct f32 exactly INSIDE a jitted graph.

    Regression: under ``--xla_allow_excess_precision`` (set by some TPU
    runtimes) XLA elided the f32->bf16->f32 round-trip in a traced build,
    zeroing mid/lo and bf16-quantizing every gathered field (a 100-radius
    ground sphere lost 16 of its r^2 = 10000, so child rays spawned below
    the surface and self-reintersected).  ``optimization_barrier`` in
    ``pack_ftab_splits`` pins the rounding; this asserts the in-jit
    reconstruction stays exact on whatever backend runs the tests."""
    import jax

    from raytracing_tests_tpu.kernels.sweep2 import pack_ftab_splits

    rng = np.random.default_rng(7)
    vals = np.float32(rng.uniform(-1.0, 1.0, (24, 128)) * 10.0 ** rng.integers(-3, 5, (24, 128)))
    vals[0, 0] = 10000.0  # the ground-sphere r^2 that caught it

    @jax.jit
    def recon(x):
        hi, mid, lo = pack_ftab_splits(x)
        return hi.astype(jnp.float32) + mid.astype(jnp.float32) + lo.astype(jnp.float32)

    out = np.asarray(recon(jnp.asarray(vals)))
    np.testing.assert_array_equal(out, vals)


def test_scene_mode_detection():
    assert scene_mode(examples.materials_scene()[0]) == "spheres"
    assert scene_mode(examples.iow_final_scene(side=3)[0]) == "spheres"
    assert scene_mode(examples.groups_scene()[0]) == "generic"  # cuboids
    assert scene_mode(examples.texturing_scene()[0]) == "spheres"  # unrotated


@pytest.mark.parametrize("name", list(SCENES))
def test_pallas_intersect_matches_brute(rng, name):
    scene, _ = SCENES[name][0]()
    accel = make_accel(scene)
    o, d = _rays(rng, 512)
    ratio = jnp.asarray(rng.uniform(0, 1, 512).astype(np.float32))
    tl = jnp.full((512,), 32000.0)
    hb = intersect_brute(scene, o, d, ratio, tl)
    hp = intersect_pallas(accel, scene, o, d, ratio, tl)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hp.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_array_equal(np.asarray(hb.obj)[m], np.asarray(hp.obj)[m])
    # The sphere kernel uses the world-space quadratic; the brute sweep scales
    # into unit space first.  Equal math, different conditioning: on a
    # radius-100 ground sphere a few rays land ~1e-3 apart in t.
    rel = np.abs(np.asarray(hb.t)[m] - np.asarray(hp.t)[m]) / np.asarray(hb.t)[m]
    assert (rel < 1e-4).mean() > 0.99, (rel < 1e-4).mean()
    assert rel.max() < 1e-2, rel.max()
    same_n = np.all(
        np.isclose(np.asarray(hb.normal)[m], np.asarray(hp.normal)[m], atol=1e-4),
        axis=-1,
    )
    assert same_n.mean() > 0.99


def test_pallas_ri_matches_brute(rng):
    scene, _ = examples.materials_scene()
    accel = make_accel(scene)
    pts = jnp.asarray(rng.uniform(-3, 3, (512, 3)).astype(np.float32))
    ratio = jnp.zeros(512)
    a = np.asarray(surrounding_refractive_index(scene, pts, ratio))
    b = np.asarray(surrounding_ri_pallas(accel, scene, pts, ratio))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("name", list(SCENES))
def test_pallas_render_matches_brute(name):
    scene_fn, use_lights = SCENES[name]
    scene, cam = scene_fn()
    lt = extract_lights(scene) if use_lights else None
    cfg_b = RenderConfig(width=24, height=16, spp=2, max_bounces=3).for_scene(scene)
    cfg_p = dataclasses.replace(cfg_b, intersector="pallas")
    rb = render(scene, cam, cfg_b, lt)
    rp = render(scene, cam, cfg_p, lt)
    np.testing.assert_allclose(
        np.asarray(rb["image"]), np.asarray(rp["image"]), atol=2e-5
    )


@pytest.mark.parametrize("name", list(SCENES))
def test_workqueue_matches_queue(name):
    from raytracing_tests_tpu.ops.workqueue import render_workqueue

    scene_fn, use_lights = SCENES[name]
    scene, cam = scene_fn()
    lt = extract_lights(scene) if use_lights else None
    cfg = RenderConfig(
        width=24, height=16, spp=2, max_bounces=3, intersector="pallas"
    ).for_scene(scene)
    rq = render(scene, cam, cfg, lt)
    rw = render_workqueue(scene, cam, cfg, lt, chunk=512)
    np.testing.assert_allclose(
        np.asarray(rq["image"]), np.asarray(rw["image"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rq["depth"]), np.asarray(rw["depth"]), atol=1e-4
    )


def test_workqueue_odd_sizes():
    from raytracing_tests_tpu.ops.workqueue import render_workqueue

    scene, cam = examples.materials_scene()
    cfg = RenderConfig(
        width=7, height=5, spp=3, max_bounces=4, intersector="pallas"
    ).for_scene(scene)
    rq = render(scene, cam, cfg)
    rw = render_workqueue(scene, cam, cfg, chunk=256)
    np.testing.assert_allclose(
        np.asarray(rq["image"]), np.asarray(rw["image"]), atol=2e-5
    )


# ---------------------------------------------------------------------------
# Round 2: forward megakernel (kernels/mega.py via ops/megalanes.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("schedule", ["natural", "sorted"])
def test_megalanes_matches_queue(schedule):
    """Lane-aligned megakernel drain (ops/megalanes.py) == queue renderer:
    same ray tree, image, and depth; zero drops (only the rare
    both-children push consumes stack capacity)."""
    from raytracing_tests_tpu.ops.megalanes import render_megalanes

    scene, cam = examples.iow_final_scene(side=5)
    cfg = RenderConfig(
        width=48, height=32, spp=4, max_bounces=5, intersector="pallas"
    ).for_scene(scene)
    oq = render(scene, cam, cfg)
    om = render_megalanes(scene, cam, cfg, chunk=2048, block=512,
                          schedule=schedule)
    iq, im = np.asarray(oq["image"]), np.asarray(om["image"])
    # Same tolerance story as test_megakernel_matches_queue: float
    # reorderings can flip a silhouette-tangent child hit on a rare lane.
    bad = np.abs(iq - im).max(axis=-1) > 2e-4
    assert bad.mean() <= 0.005, (bad.sum(), np.abs(iq - im).max())
    assert np.abs(iq - im).max() < 0.6
    ddiff = np.abs(np.asarray(oq["depth"]) - np.asarray(om["depth"]))
    assert (ddiff > 1e-3).mean() <= 0.005, (ddiff > 1e-3).sum()
    assert int(om["rays_dropped"]) == 0


def test_uber_matches_queue_statistically():
    """Persistent kernel (kernels/uber.py) vs the queue renderer.

    The uber path generates camera rays IN-KERNEL; its primaries differ
    from ``primary_rays`` by f32 rounding (~1e-7), which chaotically flips
    rare grazing samples downstream — with identical primaries the two
    paths agree to 7e-5 (verified).  So the assertion here is statistical:
    means match, only a small fraction of pixels may differ visibly, the
    depth map (primary hits) matches, and ray counts agree to ~2%."""
    from raytracing_tests_tpu.kernels.uber import render_uber

    import jax

    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.iow_final_scene(side=5)
    cfg = RenderConfig(
        width=48, height=32, spp=8, max_bounces=5, intersector="pallas"
    ).for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    d = np.abs(iq - iu).max(axis=-1)
    assert (d > 0.05).mean() < 0.03, (d > 0.05).sum()
    dq = np.abs(np.asarray(oq["depth"]) - np.asarray(ou["depth"]))
    assert (dq > 1e-2).mean() < 0.01
    rq, ru = int(oq["rays"]), int(ou["rays"])
    assert abs(rq - ru) / rq < 0.02, (rq, ru)
    assert int(ou["rays_dropped"]) == 0


def test_uber_generic_matches_queue():
    """Persistent kernel in GENERIC mode (rotated cuboids + spheres, the
    INW-01 R-grid family) vs the queue renderer.  Same statistical bar as
    the sphere-mode test (in-kernel raygen differs by f32 rounding)."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.bvh_grid_scene(side=5)
    cfg = RenderConfig(
        width=48, height=32, spp=4, max_bounces=5, intersector="pallas"
    ).for_scene(scene)
    assert cfg.pallas_mode == "generic"
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=32)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    dq = np.abs(np.asarray(oq["depth"]) - np.asarray(ou["depth"]))
    assert (dq > 1e-2).mean() < 0.01
    rq, ru = int(oq["rays"]), int(ou["rays"])
    assert abs(rq - ru) / rq < 0.02, (rq, ru)
    assert int(ou["rays_dropped"]) == 0


def test_uber_generic_anisotropic_rotated():
    """Generic uber: anisotropic rotated ellipsoids exercise the full
    local-frame transform + ellipsoid normal path (not just cuboids)."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats
    from raytracing_tests_tpu.scene.types import Camera, ELLIPSOID, SceneBuilder

    b = SceneBuilder()
    for i in range(6):
        x = (i - 2.5) * 1.2
        if i % 2 == 0:
            b.add((x, 0.0, -4.0), (0.5, 0.3, 0.4), ELLIPSOID,
                  rotation_deg=(20.0, 35.0 * i, 10.0), color=(0.8, 0.4, 0.3),
                  reflectivity=0.8, scatter_reflect=0.3)
        else:
            b.add_box((x, 0.2, -5.0), (0.6, 0.9, 0.5),
                      rotation_deg=(0.0, 25.0 * i, 15.0),
                      color=(0.3, 0.6, 0.8), reflectivity=0.9,
                      scatter_reflect=0.1)
    b.add_sphere((0.0, -100.6, -4.0), 100.0, color=(0.6, 0.6, 0.6),
                 reflectivity=0.6, scatter_reflect=0.8)
    scene = b.build()
    cam = Camera.make((0.0, 0.6, 1.0), (0.0, -0.15, -1.0), fov_y_deg=55.0,
                      focus_dist=5.0)
    cfg = RenderConfig(width=48, height=32, spp=4, max_bounces=6,
                       intersector="pallas").for_scene(scene)
    assert cfg.pallas_mode == "generic"
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    assert int(ou["rays_dropped"]) == 0
    assert np.isnan(iu).sum() == 0


def test_uber_lights_matches_queue_statistically():
    """Persistent kernel with emissive lights (INW-04 semantics: black
    background, shadow rays toward per-sample light-AABB points, emissive
    abort paints the sample white) vs the queue renderer.

    Binary shadow visibility flips on rays that graze the light's
    conservative AABB when the direction normalize differs in the last ulp
    (XLA contextually rewrites x/sqrt(y) to x*rsqrt(y)), so the assertion
    is statistical: means, row-band means, depth, and ray counts agree."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.lights_scene()
    lights = extract_lights(scene)
    cfg = RenderConfig(width=48, height=32, spp=8, max_bounces=5,
                       intersector="pallas").for_scene(scene)
    oq = jax.jit(lambda s, c, lt: render_stats(s, c, cfg, lt))(
        scene, cam, lights)
    ou = render_uber(scene, cam, cfg, lights=lights, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    band = np.abs(iq.mean(axis=(1, 2)) - iu.mean(axis=(1, 2)))
    assert band.max() < 0.05, band.max()
    dq = np.abs(np.asarray(oq["depth"]) - np.asarray(ou["depth"]))
    assert (dq > 1e-2).mean() < 0.01
    rq, ru = int(oq["rays"]), int(ou["rays"])
    assert abs(rq - ru) / rq < 0.02, (rq, ru)
    assert int(ou["rays_dropped"]) == 0
    assert np.isnan(iu).sum() == 0


def test_uber_generic_dielectric_matches_queue():
    """Generic uber with DIELECTRICS: the rotated point-in-primitive
    surrounding-RI probe (sweep2g._ri_probe_g) must reproduce the queue
    renderer's refraction chain (medium-RI transitions, TIR)."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats
    from raytracing_tests_tpu.scene.types import Camera, ELLIPSOID, SceneBuilder

    b = SceneBuilder()
    b.add((0.0, 0.0, -3.5), (0.6, 0.4, 0.5), ELLIPSOID,
          rotation_deg=(10.0, 30.0, 0.0), color=(1.0, 1.0, 1.0),
          refractive_index=1.5, refractivity=0.9, reflectivity=0.1)
    b.add_box((-1.3, 0.0, -4.0), (0.6, 0.8, 0.6),
              rotation_deg=(0.0, 40.0, 0.0), color=(0.3, 0.6, 0.8),
              reflectivity=0.9, scatter_reflect=0.2)
    b.add_box((1.3, -0.1, -4.2), (0.7, 0.6, 0.7),
              rotation_deg=(0.0, 70.0, 10.0), color=(0.8, 0.5, 0.3),
              reflectivity=0.9, scatter_reflect=0.2)
    b.add_sphere((0.0, -100.6, -4.0), 100.0, color=(0.6, 0.65, 0.6),
                 reflectivity=0.7, scatter_reflect=0.9)
    scene = b.build()
    cam = Camera.make((0.0, 0.4, 0.8), (0.0, -0.1, -1.0), fov_y_deg=55.0,
                      focus_dist=4.2)
    cfg = RenderConfig(width=48, height=32, spp=4, max_bounces=6,
                       intersector="pallas").for_scene(scene)
    assert cfg.pallas_mode == "generic" and cfg.has_dielectrics
    import jax as _jax
    oq = _jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    assert int(oq["rays"]) == int(ou["rays"]) or (
        abs(int(oq["rays"]) - int(ou["rays"])) / int(oq["rays"]) < 0.02)
    assert int(ou["rays_dropped"]) == 0
    assert np.isnan(iu).sum() == 0


def test_uber_materials_matches_queue():
    """Persistent kernel under the IOW-03 MATERIALS shading (per-ray
    medium-RI stack in the pool record, Schlick contribution shift,
    fibonacci-hemisphere scatter, refraction-continues-in-place push
    order) vs the queue renderer."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=48, height=32, spp=4, max_bounces=5,
                       shading="materials", intersector="pallas"
                       ).for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    rq, ru = int(oq["rays"]), int(ou["rays"])
    assert abs(rq - ru) / rq < 0.02, (rq, ru)
    assert int(ou["rays_dropped"]) == 0
    assert np.isnan(iu).sum() == 0


def test_uber_materials_nested_dielectric():
    """Materials uber on a nested dielectric (glass shell with an air
    bubble): the depth-2 medium stack and TIR-to-reflection conversion
    must match the queue renderer."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats
    from raytracing_tests_tpu.scene.types import Camera, SceneBuilder

    b = SceneBuilder()
    b.add_sphere((0.0, -100.5, -3.0), 100.0, color=(0.6, 0.7, 0.5),
                 reflectivity=1.0, scatter_reflect=1.0)
    b.add_sphere((0.0, 0.0, -3.0), 0.5, color=(1.0, 1.0, 1.0),
                 refractive_index=1.5, refractivity=0.9, reflectivity=0.1)
    b.add_sphere((0.0, 0.0, -3.0), 0.3, color=(1.0, 1.0, 1.0),
                 refractive_index=1.0, refractivity=0.95, reflectivity=0.05)
    scene = b.build()
    cam = Camera.make((0.0, 0.2, 0.4), (0.0, -0.05, -1.0), fov_y_deg=55.0,
                      focus_dist=3.4)
    cfg = RenderConfig(width=40, height=28, spp=4, max_bounces=7,
                       shading="materials", intersector="pallas"
                       ).for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    # The in-kernel per-round pops budget must truncate trees exactly like
    # the queue renderer's scan length: identical ray counts even on deep
    # cutoff-free dielectric trees.
    assert int(oq["rays"]) == int(ou["rays"]), (int(oq["rays"]), int(ou["rays"]))
    assert np.isnan(iu).sum() == 0


def test_uber_textured_matches_queue():
    """Persistent kernel with IN-KERNEL cube-sphere atlas texturing
    (kernels/texture.py: factored one-hot MXU gathers, exact hi/mid/lo
    texels) vs the queue renderer's XLA sample_atlas path on the texturing
    BASELINE scene (checker + fbm noise + gradient atlases)."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.texturing_scene()
    cfg = RenderConfig(width=32, height=18, spp=2, max_bounces=3,
                       intersector="pallas").for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=64)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    assert int(oq["rays"]) == int(ou["rays"])
    assert int(ou["rays_dropped"]) == 0
    assert np.isnan(iu).sum() == 0


def test_uber_textured_generic_matches_queue():
    """In-kernel texturing on a GENERIC scene (textured rotated box +
    textured sphere): exercises the unit-space local_pos from the generic
    winner refine feeding cube_sphere_uv."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats
    from raytracing_tests_tpu.scene import textures as tex
    from raytracing_tests_tpu.scene.types import Camera, SceneBuilder

    b = SceneBuilder()
    checker = b.add_texture(tex.checker_atlas(32))
    grad = b.add_texture(tex.gradient_atlas(32))
    b.add_box((-0.8, 0.0, -4.0), (0.9, 0.9, 0.9),
              rotation_deg=(0.0, 30.0, 0.0), color=(1.0, 1.0, 1.0),
              reflectivity=0.85, scatter_reflect=0.2, texture_index=checker)
    b.add_sphere((0.9, 0.0, -3.6), 0.55, color=(1.0, 0.9, 0.9),
                 reflectivity=0.9, scatter_reflect=0.2, texture_index=grad)
    b.add_sphere((0.0, -100.6, -4.0), 100.0, color=(0.6, 0.6, 0.6),
                 reflectivity=0.7, scatter_reflect=0.9)
    scene = b.build()
    cam = Camera.make((0.0, 0.4, 0.8), (0.0, -0.1, -1.0), fov_y_deg=55.0,
                      focus_dist=4.2)
    cfg = RenderConfig(width=32, height=18, spp=2, max_bounces=4,
                       intersector="pallas").for_scene(scene)
    assert cfg.pallas_mode == "generic"
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    assert int(ou["rays_dropped"]) == 0
    assert np.isnan(iu).sum() == 0


def test_uber_generic_supergroups_and_kinds():
    """The two-level super-group cull + static type specialization on a
    1k-object-family grid (side=12 -> 145 objects, >8 groups at gr=16 so
    the super level actually forms) must agree with the queue renderer."""
    import jax

    from raytracing_tests_tpu.kernels.sweep2g import make_accel2g
    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.bvh_grid_scene(side=12)
    accel = make_accel2g(scene, gr=16)
    assert accel.n_sgroups >= 2, accel.n_sgroups  # super level formed
    # Type-pure grouping: no mixed bodies on this scene, several kinds.
    assert accel.gkinds is not None and "m" not in accel.gkinds
    assert len(set(accel.gkinds)) >= 2, accel.gkinds
    cfg = RenderConfig(width=40, height=24, spp=2, max_bounces=4,
                       intersector="pallas").for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=4, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    dq = np.abs(np.asarray(oq["depth"]) - np.asarray(ou["depth"]))
    assert (dq > 1e-2).mean() < 0.01
    rq, ru = int(oq["rays"]), int(ou["rays"])
    assert abs(rq - ru) / rq < 0.02, (rq, ru)
    assert int(ou["rays_dropped"]) == 0


def test_uber_partial_final_block_and_drop_accounting():
    """Two persistent-kernel edge cases: (a) B not divisible by R*L — the
    tail grid block must render its partial round correctly; (b) a
    deliberately undersized ray stack must surface honest rays_dropped
    (never silently diverge)."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, cam = examples.iow_final_scene(side=5)
    cfg = RenderConfig(width=50, height=30, spp=3, max_bounces=4,
                       intersector="pallas").for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=4, gr=64)  # NB=5, tail 404
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    assert int(oq["rays"]) == int(ou["rays"])
    assert int(ou["rays_dropped"]) == 0

    s2, c2 = examples.materials_scene()
    cfg2 = RenderConfig(width=32, height=24, spp=4, max_bounces=7,
                        shading="materials", intersector="pallas"
                        ).for_scene(s2)
    o2 = render_uber(s2, c2, cfg2, L=256, R=3, gr=16, qcap=1)
    assert int(o2["rays_dropped"]) > 0  # overflow is visible, not silent
    assert np.isnan(np.asarray(o2["image"])).sum() == 0


def test_uber_multifocus_matches_queue():
    """Multi-focus (K=3) in the persistent kernel's raygen: sample s
    focuses at focus_dist[s % K] (the reference's u_NumOfFocusDist kernel
    path, In-Next-Week/base.h:187-239, 01_BVH glsl:389-409).  Same
    statistical bar as the single-focus test — and a guard that the K=3
    image actually DIFFERS from the K=1 render (the aperture is wide, so
    defocused samples must move pixels)."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    scene, _ = examples.materials_scene()
    cam = examples.Camera.make((0.0, 0.7, 1.2), (0.0, -0.2, -1.0),
                               fov_y_deg=60.0, aperture=0.35,
                               focus_dist=(2.2, 3.6, 6.0))
    cfg = RenderConfig(width=48, height=32, spp=6, max_bounces=5,
                       intersector="pallas").for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    rq, ru = int(oq["rays"]), int(ou["rays"])
    assert abs(rq - ru) / rq < 0.02, (rq, ru)
    assert int(ou["rays_dropped"]) == 0

    cam1 = examples.Camera.make((0.0, 0.7, 1.2), (0.0, -0.2, -1.0),
                                fov_y_deg=60.0, aperture=0.35,
                                focus_dist=2.2)
    o1 = render_uber(scene, cam1, cfg, L=256, R=8, gr=16)
    assert float(np.abs(np.asarray(o1["image"]) - iu).max()) > 0.02


def test_generic_census_rotation_kinds():
    """Coarse-Morton type packing + rotation-structure census: the R-grid
    scene (unrotated spheres, y-rotated cubes, axis-aligned ground box)
    must census into 's' / 'cy' / 'a' groups — no mixed bodies — and the
    packing must not change the rendered image beyond the statistical
    envelope (same primaries, same oracle arithmetic per row)."""
    import os

    import jax

    from raytracing_tests_tpu.kernels.sweep2g import make_accel2g
    from raytracing_tests_tpu.kernels.uber import render_uber

    scene, cam = examples.bvh_grid_scene(side=6)
    acc = make_accel2g(scene, gr=16, sort_origin=cam.position)
    kinds = set(acc.gkinds)
    # Class-chunked packing keeps even the partial tails TYPE-PURE (a
    # merged mixed tail runs both primitives' arithmetic over all rows and
    # measured slower — PERFORMANCE.md fact 30), at the cost of up to one
    # extra group vs plain Morton chunking.
    assert "m" not in kinds, acc.gkinds
    assert "s" in kinds and ("cy" in kinds or "a" in kinds), acc.gkinds

    cfg = RenderConfig(width=48, height=32, spp=4, max_bounces=5,
                       intersector="pallas").for_scene(scene)
    o_c = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    os.environ["UBER_TPACK"] = "global"
    try:
        o_g = render_uber(scene, cam, cfg, L=256, R=8, gr=16)
    finally:
        del os.environ["UBER_TPACK"]
    ic, ig = np.asarray(o_c["image"]), np.asarray(o_g["image"])
    assert abs(float(ic.mean()) - float(ig.mean())) < 5e-3
    assert (np.abs(ic - ig).max(axis=-1) > 0.05).mean() < 0.03
    assert int(o_c["rays"]) == int(o_g["rays"])


def test_cuboid_fastinv_matches_safeinv():
    """The bare-reciprocal slab (``_cub_t_inf``) must be BITWISE-identical
    to the safe-inverse form on scenes without axis-parallel degenerate
    lanes (1/ld is the same bits wherever |ld| >= 1e-12): same image, same
    ray count.  Also pins the parallel-ray semantics: a ray with an exact
    zero direction component must still hit a box it faces (the +-inf
    slab interval), not phantom-miss."""
    import os

    import jax

    from raytracing_tests_tpu.kernels.sweep2g import _cub_t_inf
    from raytracing_tests_tpu.kernels.uber import render_uber

    scene, cam = examples.bvh_grid_scene(side=6)
    cfg = RenderConfig(width=40, height=24, spp=2, max_bounces=5,
                       intersector="pallas").for_scene(scene)
    o_f = render_uber(scene, cam, cfg, L=256, R=6, gr=16)
    os.environ["UBER_ABLATE"] = "safeinv"
    try:
        o_s = render_uber(scene, cam, cfg, L=256, R=6, gr=16)
    finally:
        del os.environ["UBER_ABLATE"]
    assert float(np.abs(np.asarray(o_f["image"])
                        - np.asarray(o_s["image"])).max()) == 0.0
    assert int(o_f["rays"]) == int(o_s["rays"])

    # Axis-parallel ray straight at a unit box: dz-only direction (dx =
    # dy = 0 exactly) -> inv = +-inf on x/y; origin inside the x/y slabs.
    t = _cub_t_inf(*[jnp.full((1, 4), v, jnp.float32) for v in
                     (0.1, 0.2, -3.0,  0.0, 0.0, 1.0)],
                   jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t)[0], 2.5, rtol=1e-6)
    # Same ray OUTSIDE the x slab: empty interval -> miss.
    t2 = _cub_t_inf(*[jnp.full((1, 4), v, jnp.float32) for v in
                      (2.0, 0.2, -3.0,  0.0, 0.0, 1.0)],
                    jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    assert float(np.asarray(t2).min()) > 1e30


def test_uber_aa_grid_and_ortho_match_queue():
    """IOW-02 aa_grid supersampling and the orthographic camera now ride
    the persistent kernel (static jitter table / trace-time ortho branch
    in raygen) — statistical parity vs the queue renderer, plus a guard
    that each mode actually changes the image vs its counterpart."""
    import jax

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import render_stats

    # aa_grid on the groups scene (the reference workload that uses it).
    scene, cam = examples.groups_scene()
    cfg = RenderConfig(width=48, height=32, spp=5, max_bounces=4,
                       aa_grid=True, intersector="pallas").for_scene(scene)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    ou = render_uber(scene, cam, cfg, L=256, R=10, gr=16)
    iq, iu = np.asarray(oq["image"]), np.asarray(ou["image"])
    assert abs(float(iq.mean()) - float(iu.mean())) < 5e-3
    assert (np.abs(iq - iu).max(axis=-1) > 0.05).mean() < 0.03
    assert int(ou["rays_dropped"]) == 0
    cfg0 = RenderConfig(width=48, height=32, spp=5, max_bounces=4,
                        intersector="pallas").for_scene(scene)
    o0 = render_uber(scene, cam, cfg0, L=256, R=10, gr=16)
    assert float(np.abs(np.asarray(o0["image"]) - iu).max()) > 1e-4

    # Orthographic camera (GLCore OrthographicCamera): parallel rays.
    import dataclasses

    s2, c2 = examples.sphere_scene()
    c2o = dataclasses.replace(c2, ortho_height=2.5)
    cfg2 = RenderConfig(width=48, height=32, spp=4, max_bounces=4,
                        intersector="pallas").for_scene(s2)
    oq2 = jax.jit(lambda s, c: render_stats(s, c, cfg2))(s2, c2o)
    ou2 = render_uber(s2, c2o, cfg2, L=256, R=6, gr=16)
    iq2, iu2 = np.asarray(oq2["image"]), np.asarray(ou2["image"])
    assert abs(float(iq2.mean()) - float(iu2.mean())) < 5e-3
    assert (np.abs(iq2 - iu2).max(axis=-1) > 0.05).mean() < 0.03
    op = render_uber(s2, c2, cfg2, L=256, R=6, gr=16)  # perspective
    assert float(np.abs(np.asarray(op["image"]) - iu2).max()) > 1e-3


def test_uber_staged_flush_bitwise_and_caches():
    """Round-5 knobs: the staged flush (stage=4) must be BITWISE identical
    to the per-finish flush (each out cell receives exactly one addition),
    and the identity-keyed packing caches must invalidate on any scene
    mutation (fact 44/45)."""
    from raytracing_tests_tpu.kernels.uber import render_uber

    scene, cam = examples.iow_final_scene(side=4)
    cfg = RenderConfig(width=48, height=24, spp=4, max_bounces=5,
                       intersector="pallas").for_scene(scene)
    o0 = render_uber(scene, cam, cfg, L=256, R=8, gr=32)
    o4 = render_uber(scene, cam, cfg, L=256, R=8, gr=32, stage=4)
    assert (np.asarray(o0["image"]) == np.asarray(o4["image"])).all()
    assert (np.asarray(o0["depth"]) == np.asarray(o4["depth"])).all()
    assert int(o0["rays"]) == int(o4["rays"])
    # stage=3 with R=8: the final post-loop drain covers partial staging.
    o3 = render_uber(scene, cam, cfg, L=256, R=8, gr=32, stage=3)
    assert (np.asarray(o0["image"]) == np.asarray(o3["image"])).all()
    # Cache invalidation: a replace()d scene must re-render differently.
    s2 = scene.replace(color=np.asarray(scene.color) * 0.2)
    o2 = render_uber(s2, cam, cfg, L=256, R=8, gr=32)
    assert np.abs(np.asarray(o2["image"]) - np.asarray(o0["image"])).max() > 0.05
    # And the original still hits its cache with the original image.
    oh = render_uber(scene, cam, cfg, L=256, R=8, gr=32)
    assert (np.asarray(oh["image"]) == np.asarray(o0["image"])).all()
