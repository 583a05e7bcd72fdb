"""Spiral-tile progressive rendering (the reference's base2.h tiled driver)."""

import numpy as np

from raytracing_tests_tpu.ops.render import RenderConfig, render
from raytracing_tests_tpu.ops.tiles import render_progressive, spiral_tile_order
from raytracing_tests_tpu.scene import examples


def test_spiral_starts_at_center_and_covers_all():
    order = spiral_tile_order(5, 3)
    assert order[0].tolist() == [2, 1]
    assert len({tuple(t) for t in order.tolist()}) == 15


def test_progressive_matches_full_render():
    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=48, height=32, spp=2, max_bounces=3)
    ref = np.asarray(render(scene, cam, cfg)["image"])
    fractions = []
    for out in render_progressive(scene, cam, cfg, tile=(16, 16), tiles_per_step=2):
        fractions.append(out["done_fraction"])
    assert fractions == sorted(fractions) and fractions[-1] == 1.0
    np.testing.assert_allclose(out["image"], ref, atol=1e-5)


def test_progressive_tile_not_dividing_image():
    scene, cam = examples.sphere_scene()
    cfg = RenderConfig(width=30, height=22, spp=1, max_bounces=2)
    ref = np.asarray(render(scene, cam, cfg)["image"])
    for out in render_progressive(scene, cam, cfg, tile=(16, 16)):
        pass
    np.testing.assert_allclose(out["image"], ref, atol=1e-5)
