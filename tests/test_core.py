"""Unit tests for core math: intersections, normals, sampling, linalg."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracing_tests_tpu.core import geometry, linalg, sampling


class TestLinalg:
    def test_rotation_orthogonal(self):
        R = linalg.rotation_from_euler(jnp.array([30.0, 45.0, 60.0]))
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
        assert np.isclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-6)

    def test_rotation_y_90(self):
        R = linalg.rotation_from_euler(jnp.array([0.0, 90.0, 0.0]))
        # yaw 90deg about +Y maps +x -> -z
        v = R @ jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, -1.0], atol=1e-6)

    def test_reflect(self):
        d = jnp.array([1.0, -1.0, 0.0]) / np.sqrt(2)
        n = jnp.array([0.0, 1.0, 0.0])
        r = linalg.reflect(d, n)
        np.testing.assert_allclose(np.asarray(r), [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0], atol=1e-6)

    def test_refract_straight_through(self):
        d = jnp.array([0.0, -1.0, 0.0])
        n = jnp.array([0.0, 1.0, 0.0])
        r = linalg.refract(d, n, 1.0)
        np.testing.assert_allclose(np.asarray(r), [0.0, -1.0, 0.0], atol=1e-6)

    def test_refract_tir(self):
        # Grazing ray from dense to sparse medium: total internal reflection.
        d = linalg.normalize(jnp.array([1.0, -0.1, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        r = linalg.refract(d, n, 1.5)
        np.testing.assert_allclose(np.asarray(r), [0.0, 0.0, 0.0], atol=1e-7)

    def test_snell(self):
        # 45deg into glass: sin(theta_t) = sin(45)/1.5
        d = linalg.normalize(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        r = np.asarray(linalg.refract(d, n, 1.0 / 1.5))
        sin_t = abs(r[0]) / np.linalg.norm(r)
        np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-6)

    def test_schlick_limits(self):
        assert np.isclose(float(linalg.schlick(1.0, 1.5)), 0.04, atol=1e-6)
        assert np.isclose(float(linalg.schlick(0.0, 1.5)), 1.0, atol=1e-6)


class TestIntersections:
    def test_sphere_head_on(self):
        t = geometry.ray_ellipsoid_t(
            jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 1.0, 1.0])
        )
        assert np.isclose(float(t), 4.0, atol=1e-5)

    def test_sphere_from_inside_hits_back_wall(self):
        t = geometry.ray_ellipsoid_t(
            jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([2.0, 2.0, 2.0])
        )
        assert np.isclose(float(t), 2.0, atol=1e-5)

    def test_sphere_miss(self):
        t = geometry.ray_ellipsoid_t(
            jnp.array([0.0, 5.0, -5.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 1.0, 1.0])
        )
        assert float(t) == -1.0

    def test_ellipsoid_scaled(self):
        t = geometry.ray_ellipsoid_t(
            jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 1.0, 3.0])
        )
        assert np.isclose(float(t), 2.0, atol=1e-5)

    def test_cuboid_head_on(self):
        t = geometry.ray_cuboid_t(
            jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([2.0, 2.0, 2.0])
        )
        assert np.isclose(float(t), 4.0, atol=1e-5)

    def test_cuboid_inside_exit(self):
        t = geometry.ray_cuboid_t(
            jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([2.0, 2.0, 2.0])
        )
        assert np.isclose(float(t), 1.0, atol=1e-5)

    def test_cuboid_behind_misses(self):
        t = geometry.ray_cuboid_t(
            jnp.array([0.0, 0.0, 5.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([2.0, 2.0, 2.0])
        )
        assert float(t) == -1.0

    def test_cuboid_axis_parallel_ray(self):
        # Ray parallel to a slab: IEEE infs must not break the test.
        t = geometry.ray_cuboid_t(
            jnp.array([0.5, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]), jnp.array([2.0, 2.0, 2.0])
        )
        assert np.isclose(float(t), 4.0, atol=1e-5)

    def test_normals(self):
        n = geometry.ellipsoid_normal(jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(n), [0.0, 1.0, 0.0], atol=1e-6)
        n = geometry.cuboid_normal(jnp.array([0.0, 0.0, -1.0]), jnp.array([2.0, 2.0, 2.0]))
        np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, -1.0], atol=1e-6)

    def test_aabb_hit(self):
        ok = geometry.ray_aabb_hit(
            jnp.array([-1.0, -1.0, -1.0]),
            jnp.array([1.0, 1.0, 1.0]),
            jnp.array([0.0, 0.0, -5.0]),
            jnp.array([0.0, 0.0, 1.0]),
            jnp.float32(100.0),
        )
        assert bool(ok)
        miss = geometry.ray_aabb_hit(
            jnp.array([-1.0, -1.0, -1.0]),
            jnp.array([1.0, 1.0, 1.0]),
            jnp.array([0.0, 5.0, -5.0]),
            jnp.array([0.0, 0.0, 1.0]),
            jnp.float32(100.0),
        )
        assert not bool(miss)

    def test_aabb_t_limit(self):
        # Box entry at t=4, limit 3 -> culled.
        ok = geometry.ray_aabb_hit(
            jnp.array([-1.0, -1.0, -1.0]),
            jnp.array([1.0, 1.0, 1.0]),
            jnp.array([0.0, 0.0, -5.0]),
            jnp.array([0.0, 0.0, 1.0]),
            jnp.float32(3.0),
        )
        assert not bool(ok)

    def test_object_aabb_rotation(self):
        # scale (2,1,1) yawed 90deg: the long axis swings from x onto z.
        R = linalg.rotation_from_euler(jnp.array([0.0, 90.0, 0.0]))
        lo, hi = geometry.object_aabb(
            jnp.zeros(3), jnp.zeros(3), R, jnp.array([2.0, 1.0, 1.0])
        )
        np.testing.assert_allclose(np.asarray(hi), [1.0, 1.0, 2.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(lo), [-1.0, -1.0, -2.0], atol=1e-5)


class TestSampling:
    def test_sunflower_center(self):
        pt = sampling.sunflower_disc(jnp.array([0]), 16, 1.0)
        np.testing.assert_allclose(np.asarray(pt), [[0.0, 0.0]], atol=1e-7)

    def test_sunflower_within_aperture(self):
        idx = jnp.arange(64)
        pts = np.asarray(sampling.sunflower_disc(idx, 64, 2.0))
        r = np.linalg.norm(pts, axis=-1)
        assert np.all(r <= 1.0 + 1e-5)
        assert r.max() > 0.9  # rim samples reach the boundary

    def test_fibonacci_hemisphere_normalized(self):
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (8, 3))
        out = np.asarray(sampling.fibonacci_hemisphere(jnp.arange(8), 8, 0.5, d))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    def test_deviate_zero_scatter_is_identity(self):
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
        out = np.asarray(sampling.deviate_within_cone(d, jnp.arange(4), 4, 0.0))
        np.testing.assert_allclose(out, np.asarray(d), atol=1e-6)

    def test_supersample_grid(self):
        offs, grid = sampling.supersample_grid_offsets(9)
        assert grid == 3
        assert offs.shape == (9, 2)
        assert offs.max() <= grid


class TestSceneBuilder:
    def test_build_padding_and_mask(self):
        from raytracing_tests_tpu.scene.types import SceneBuilder

        b = SceneBuilder()
        b.add_sphere((0, 0, 0), 1.0)
        b.add_box((1, 2, 3), (1, 1, 1), color=(1, 0, 0))
        s = b.build()
        assert s.capacity % 8 == 0
        assert int(s.num_valid) == 2
        assert s.obj_type[0] == 1 and s.obj_type[1] == 2
        np.testing.assert_allclose(np.asarray(s.color[1]), [1, 0, 0])

    def test_world_aabbs_motion_sweep(self):
        from raytracing_tests_tpu.scene.types import SceneBuilder

        b = SceneBuilder()
        b.add_sphere((1, 0, 0), 0.5, delta_position=(1, 0, 0))
        s = b.build()
        lo, hi = s.world_aabbs()
        np.testing.assert_allclose(np.asarray(lo[0]), [-0.5, -0.5, -0.5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(hi[0]), [1.5, 0.5, 0.5], atol=1e-6)
