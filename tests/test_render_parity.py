"""The central correctness contract: the vectorized jit wavefront renderer
must match the independent CPU oracle (``reference/cpu_renderer.py``) pixel
for pixel on every feature of the reference arc — plain hits, mirrors,
dielectrics, motion blur, textures, emissive lights.

Tiny resolutions: the oracle is deliberately slow.
"""

import numpy as np
import pytest

from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights, render_jit
from raytracing_tests_tpu.reference.cpu_renderer import render_cpu
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.scene.types import Camera, SceneBuilder

ATOL = 2e-4


def _compare(scene, camera, cfg, atol=ATOL):
    lights = extract_lights(scene) if cfg.enable_lights else None
    got = render_jit(scene, camera, cfg, lights)
    want = render_cpu(scene, camera, cfg)
    img_got = np.asarray(got["image"], np.float64)
    img_want = np.asarray(want["image"], np.float64)
    # Allow a tiny fraction of boundary pixels to differ (f32 vs f64 hit
    # ordering at silhouettes); the reference itself is not bit-stable there.
    close = np.isclose(img_got, img_want, atol=atol, rtol=1e-3)
    frac = close.mean()
    assert frac >= 0.995, (
        f"only {frac:.4f} of pixels match; max err "
        f"{np.abs(img_got - img_want).max():.3e}"
    )
    return got, want


def test_single_sphere_normals_view():
    scene, camera = examples.sphere_scene()
    cfg = RenderConfig(width=24, height=16, spp=1, show_normals=True)
    _compare(scene, camera, cfg)


def test_sphere_scene():
    scene, camera = examples.sphere_scene()
    cfg = RenderConfig(width=24, height=16, spp=2, max_bounces=3)
    _compare(scene, camera, cfg)


def test_groups_mirror_scene():
    scene, camera = examples.groups_scene()
    cfg = RenderConfig(width=20, height=14, spp=2, max_bounces=4)
    _compare(scene, camera, cfg)


def test_materials_dielectric_scene():
    scene, camera = examples.materials_scene()
    cfg = RenderConfig(width=20, height=14, spp=3, max_bounces=4)
    _compare(scene, camera, cfg)


def test_motion_blur_scene():
    scene, camera = examples.motion_blur_scene()
    cfg = RenderConfig(width=20, height=14, spp=4, max_bounces=3)
    _compare(scene, camera, cfg)


def test_texturing_scene():
    scene, camera = examples.texturing_scene(tex_size=16)
    cfg = RenderConfig(width=20, height=14, spp=2, max_bounces=3)
    _compare(scene, camera, cfg)


def test_lights_scene():
    scene, camera = examples.lights_scene()
    cfg = RenderConfig(width=16, height=12, spp=2, max_bounces=3)
    got, _ = _compare(scene, camera, cfg, atol=5e-4)
    # Lights mode: background must be black, and something must be lit.
    img = np.asarray(got["image"])
    assert img.max() > 0.05


def test_depth_output():
    scene, camera = examples.sphere_scene()
    cfg = RenderConfig(width=24, height=16, spp=1, max_bounces=2)
    lights = None
    got = render_jit(scene, camera, cfg, lights)
    want = render_cpu(scene, camera, cfg)
    np.testing.assert_allclose(
        np.asarray(got["depth"]), want["depth"], rtol=1e-3, atol=1e-2
    )


def test_dof_aperture_changes_image():
    scene, _ = examples.materials_scene()
    cam_sharp = Camera.make((0.0, 0.3, 0.5), (0.0, -0.08, -1.0), 55.0, 0.0, 3.5)
    cam_blur = Camera.make((0.0, 0.3, 0.5), (0.0, -0.08, -1.0), 55.0, 0.6, 3.5)
    cfg = RenderConfig(width=16, height=12, spp=8, max_bounces=2)
    a = np.asarray(render_jit(scene, cam_sharp, cfg, None)["image"])
    b = np.asarray(render_jit(scene, cam_blur, cfg, None)["image"])
    assert np.abs(a - b).max() > 1e-3


def test_motion_blur_smears():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, -3.0), 0.5, color=(1, 0, 0), delta_position=(1.0, 0, 0))
    scene_moving = b.build()
    b2 = SceneBuilder()
    b2.add_sphere((0.0, 0.0, -3.0), 0.5, color=(1, 0, 0))
    scene_static = b2.build()
    cam = Camera.make((0, 0, 0), (0, 0, -1), 60.0, focus_dist=3.0)
    cfg = RenderConfig(width=24, height=16, spp=8, max_bounces=1)
    moving = np.asarray(render_jit(scene_moving, cam, cfg, None)["image"])
    static = np.asarray(render_jit(scene_static, cam, cfg, None)["image"])
    # Count pixels that are distinctly red (sphere) vs the bluish sky: the
    # moving sphere's sweep must touch more pixels.
    red_m = (moving[..., 0] - moving[..., 2]) > 0.05
    red_s = (static[..., 0] - static[..., 2]) > 0.05
    assert red_m.sum() > red_s.sum()


def test_materials_shading_mode_oracle_parity():
    """IOW-03 materials model (per-ray medium RI, Schlick shift, fibonacci
    scatter) vs the independent oracle transcription — both intersectors."""
    import dataclasses

    scene, camera = examples.materials_scene()
    cfg = RenderConfig(
        width=24, height=16, spp=4, max_bounces=5, shading="materials"
    ).for_scene(scene)
    _compare(scene, camera, cfg)
    _compare(scene, camera, dataclasses.replace(cfg, intersector="pallas"))


def test_materials_shading_differs_from_bvh_shading():
    """The two shading models are genuinely different physics: Schlick split
    and medium tracking must change the image (guards against the materials
    path silently falling back to the INW model)."""
    scene, camera = examples.materials_scene()
    base = RenderConfig(width=20, height=14, spp=2, max_bounces=4).for_scene(scene)
    import dataclasses

    a = np.asarray(render_jit(scene, camera, base, None)["image"])
    b = np.asarray(
        render_jit(
            scene, camera, dataclasses.replace(base, shading="materials"), None
        )["image"]
    )
    assert np.abs(a - b).max() > 0.02
