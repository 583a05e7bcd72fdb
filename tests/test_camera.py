"""Camera features: multi-focus arrays + supersampling AA grid."""

import dataclasses

import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig, render
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.scene.types import Camera


def test_multifocus_changes_image_and_k1_matches_scalar():
    scene, _ = examples.materials_scene()
    cfg = RenderConfig(width=24, height=16, spp=6, max_bounces=3)
    cam1 = Camera.make((0, 0.3, 0.5), (0, -0.08, -1), aperture=0.1, focus_dist=3.5)
    camk1 = Camera.make((0, 0.3, 0.5), (0, -0.08, -1), aperture=0.1, focus_dist=[3.5])
    camK = Camera.make(
        (0, 0.3, 0.5), (0, -0.08, -1), aperture=0.1, focus_dist=[2.0, 3.5, 6.0]
    )
    r1 = np.asarray(render(scene, cam1, cfg)["image"])
    rk1 = np.asarray(render(scene, camk1, cfg)["image"])
    rK = np.asarray(render(scene, camK, cfg)["image"])
    np.testing.assert_allclose(r1, rk1, atol=1e-7)
    assert not np.allclose(r1, rK)
    assert np.isfinite(rK).all()


def test_aa_grid_smooths_edges():
    scene, cam = examples.groups_scene()
    cfg = RenderConfig(width=24, height=16, spp=4, max_bounces=3)
    r0 = np.asarray(render(scene, cam, cfg)["image"])
    r1 = np.asarray(render(scene, cam, dataclasses.replace(cfg, aa_grid=True))["image"])
    assert not np.allclose(r0, r1)
    assert np.isfinite(r1).all()
    # AA must reduce the sharpest horizontal edge step.
    assert np.abs(np.diff(r1, axis=1)).max() < np.abs(np.diff(r0, axis=1)).max()


def test_pitch_yaw_constructor():
    cam = Camera.from_pitch_yaw((0, 0, 0), pitch_deg=0.0, yaw_deg=-90.0)
    np.testing.assert_allclose(np.asarray(cam.direction), [0, 0, -1], atol=1e-6)


def test_orthographic_camera():
    """Parallel-ray projection (the reference's OrthographicCamera)."""
    scene, _ = examples.materials_scene()
    cfg = RenderConfig(width=24, height=16, spp=2, max_bounces=3)
    cam_o = Camera.orthographic((0, 0.3, 2.0), (0, -0.05, -1), height=3.0)
    img = np.asarray(render(scene, cam_o, cfg)["image"])
    assert np.isfinite(img).all()
    # parallel rays: direction must be identical for every pixel
    from raytracing_tests_tpu.ops.camera_rays import primary_rays

    o, d, _ = primary_rays(cam_o, 8, 6, 2)
    d = np.asarray(d).reshape(-1, 3)
    np.testing.assert_allclose(d, np.broadcast_to(d[0], d.shape), atol=1e-6)
    o = np.asarray(o).reshape(-1, 3)
    assert not np.allclose(o, o[0])  # origins form the view-plane lattice
