"""Mesh-sharded rendering == single-device rendering, on the virtual 8-device
CPU mesh (SURVEY.md §4: multi-host behavior tested without a pod via
``--xla_force_host_platform_device_count``)."""

import numpy as np
import pytest

import jax

from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights, render_jit
from raytracing_tests_tpu.parallel import make_mesh, render_sharded_jit, row_permutation
from raytracing_tests_tpu.scene import examples


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_row_permutation_roundtrip():
    perm, inverse, padded = row_permutation(13, 4)
    assert padded == 16
    x = np.arange(16)
    assert np.array_equal(x[perm][inverse], x)
    # shard 0 holds rows 0, 4, 8, 12 (strided interleave)
    assert list(perm[:4]) == [0, 4, 8, 12]


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_matches_single_device(n_dev):
    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=32, height=20, spp=4, max_bounces=4)
    ref = render_jit(scene, cam, cfg)
    mesh = make_mesh(n_dev)
    out = render_sharded_jit(scene, cam, cfg, mesh)
    np.testing.assert_allclose(out["image"], ref["image"], atol=1e-5)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-4)


def test_sharded_height_not_divisible():
    scene, cam = examples.groups_scene()
    cfg = RenderConfig(width=16, height=13, spp=2, max_bounces=3)  # 13 % 8 != 0
    ref = render_jit(scene, cam, cfg)
    out = render_sharded_jit(scene, cam, cfg, make_mesh(8))
    np.testing.assert_allclose(out["image"], ref["image"], atol=1e-5)


def test_sharded_with_lights():
    scene, cam = examples.lights_scene()
    lights = extract_lights(scene)
    cfg = RenderConfig(width=16, height=12, spp=2, max_bounces=3)
    ref = render_jit(scene, cam, cfg, lights)
    out = render_sharded_jit(scene, cam, cfg, make_mesh(8), lights)
    np.testing.assert_allclose(out["image"], ref["image"], atol=1e-5)


def test_lane_chunked_matches_unchunked():
    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=32, height=20, spp=4, max_bounces=4)
    cfg_chunk = RenderConfig(
        width=32, height=20, spp=4, max_bounces=4, lane_chunk=500  # non-divisor
    )
    ref = render_jit(scene, cam, cfg)
    out = render_jit(scene, cam, cfg_chunk)
    np.testing.assert_allclose(out["image"], ref["image"], atol=1e-6)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-6)


def test_uber_sharded_matches_single_device():
    """Persistent kernel over the 8-device mesh == single-device persistent
    kernel, bit-for-bit (identical in-kernel ray generation per global
    row)."""
    import numpy as np

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import RenderConfig
    from raytracing_tests_tpu.parallel.render_sharded import render_uber_sharded
    from raytracing_tests_tpu.scene import examples

    scene, cam = examples.iow_final_scene(side=5)
    cfg = RenderConfig(width=48, height=32, spp=2, max_bounces=4,
                       intersector="pallas").for_scene(scene)
    single = render_uber(scene, cam, cfg, L=256, R=4, gr=64)
    mesh = make_mesh(8)
    sharded = render_uber_sharded(scene, cam, cfg, mesh, L=256, R=4, gr=64)
    np.testing.assert_allclose(
        np.asarray(single["image"]), np.asarray(sharded["image"]), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(single["depth"]), np.asarray(sharded["depth"]), atol=1e-4)
    assert int(single["rays"]) == int(sharded["rays"])


def test_uber_sharded_materials_shading():
    """Sharded persistent kernel under the IOW-03 MATERIALS shading model
    == single-device (the second flagship rides the multi-chip path)."""
    import numpy as np

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import RenderConfig
    from raytracing_tests_tpu.parallel.render_sharded import render_uber_sharded
    from raytracing_tests_tpu.scene import examples

    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=40, height=24, spp=2, max_bounces=4,
                       shading="materials",
                       intersector="pallas").for_scene(scene)
    single = render_uber(scene, cam, cfg, L=256, R=4, gr=16)
    mesh = make_mesh(8)
    sharded = render_uber_sharded(scene, cam, cfg, mesh, L=256, R=4, gr=16)
    np.testing.assert_allclose(
        np.asarray(single["image"]), np.asarray(sharded["image"]), atol=2e-6)
    assert int(single["rays"]) == int(sharded["rays"])
    assert int(sharded["rays_dropped"]) == 0


def test_uber_sharded_lights_and_textures():
    """Sharded persistent kernel with emissive lights, and with an atlas-
    textured scene (the in-kernel texture tables replicate per device)."""
    import numpy as np

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights
    from raytracing_tests_tpu.parallel.render_sharded import render_uber_sharded
    from raytracing_tests_tpu.scene import examples

    mesh = make_mesh(8)
    scene, cam = examples.lights_scene()
    lights = extract_lights(scene)
    cfg = RenderConfig(width=40, height=24, spp=2, max_bounces=4,
                       intersector="pallas").for_scene(scene)
    single = render_uber(scene, cam, cfg, lights=lights, L=256, R=4, gr=16)
    sharded = render_uber_sharded(scene, cam, cfg, mesh, lights=lights,
                                  L=256, R=4, gr=16)
    np.testing.assert_allclose(
        np.asarray(single["image"]), np.asarray(sharded["image"]), atol=2e-6)
    assert int(single["rays"]) == int(sharded["rays"])

    scene, cam = examples.texturing_scene()
    cfg = RenderConfig(width=40, height=24, spp=2, max_bounces=3,
                       intersector="pallas").for_scene(scene)
    single = render_uber(scene, cam, cfg, L=256, R=4, gr=16)
    sharded = render_uber_sharded(scene, cam, cfg, mesh, L=256, R=4, gr=16)
    np.testing.assert_allclose(
        np.asarray(single["image"]), np.asarray(sharded["image"]), atol=2e-6)
    assert int(single["rays"]) == int(sharded["rays"])


def test_uber_sharded_camera_features_match_single():
    """Round-5 advisor regression: the sharded persistent kernel must ride
    the SAME static raygen switches as the single-device path for aa_grid
    supersampling, multi-focus cameras, and orthographic cameras — a
    silent default rendered a different image with no error."""
    import dataclasses

    import numpy as np

    from raytracing_tests_tpu.kernels.uber import render_uber
    from raytracing_tests_tpu.ops.render import RenderConfig
    from raytracing_tests_tpu.parallel.render_sharded import render_uber_sharded
    from raytracing_tests_tpu.scene import examples

    scene, cam = examples.iow_final_scene(side=4)
    mesh = make_mesh(4)
    base = RenderConfig(width=32, height=24, spp=4, max_bounces=4,
                        intersector="pallas").for_scene(scene)

    # aa_grid: grid jitter instead of DOF sampling.
    cfg = dataclasses.replace(base, aa_grid=True)
    single = render_uber(scene, cam, cfg, L=256, R=4, gr=64)
    shard = render_uber_sharded(scene, cam, cfg, mesh, L=256, R=4, gr=64)
    np.testing.assert_allclose(np.asarray(single["image"]),
                               np.asarray(shard["image"]), atol=2e-6)

    # multi-focus: K=3 focus distances cycle over samples.
    cam_mf = examples.Camera.make(
        np.asarray(cam.position), np.asarray(cam.direction),
        fov_y_deg=30.0, aperture=0.1, focus_dist=[6.0, 10.0, 14.0])
    single = render_uber(scene, cam_mf, base, L=256, R=4, gr=64)
    shard = render_uber_sharded(scene, cam_mf, base, mesh, L=256, R=4,
                                gr=64)
    np.testing.assert_allclose(np.asarray(single["image"]),
                               np.asarray(shard["image"]), atol=2e-6)

    # orthographic camera.
    cam_o = examples.Camera.orthographic((0.0, 1.0, 4.0), (0.0, -0.2, -1.0),
                                         height=6.0)
    single = render_uber(scene, cam_o, base, L=256, R=4, gr=64)
    shard = render_uber_sharded(scene, cam_o, base, mesh, L=256, R=4, gr=64)
    np.testing.assert_allclose(np.asarray(single["image"]),
                               np.asarray(shard["image"]), atol=2e-6)
