"""Native (C++) host runtime: LBVH parity with the on-device builder, and
noise baking sanity. Skipped cleanly when g++ is unavailable."""

import numpy as np
import pytest

from raytracing_tests_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_native_lbvh_matches_device_builder():
    from raytracing_tests_tpu.bvh import build_lbvh
    from raytracing_tests_tpu.bvh.host_build import build_lbvh_native
    from raytracing_tests_tpu.scene import examples

    for scene in [
        examples.bvh_grid_scene(side=6)[0],  # padded capacity
        examples.materials_scene()[0],
        examples.iow_final_scene(side=4)[0],
    ]:
        host = build_lbvh_native(scene)
        dev = build_lbvh(scene)
        np.testing.assert_array_equal(np.asarray(host.left), np.asarray(dev.left))
        np.testing.assert_array_equal(np.asarray(host.right), np.asarray(dev.right))
        np.testing.assert_array_equal(np.asarray(host.parent), np.asarray(dev.parent))
        np.testing.assert_array_equal(np.asarray(host.obj_id), np.asarray(dev.obj_id))
        np.testing.assert_allclose(
            np.asarray(host.bb_min), np.asarray(dev.bb_min), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(host.bb_max), np.asarray(dev.bb_max), atol=1e-5
        )


def test_native_lbvh_renders_identically():
    """Traversal over the host-built tree == brute force, end to end."""
    import jax.numpy as jnp

    from raytracing_tests_tpu.bvh.host_build import build_lbvh_native
    from raytracing_tests_tpu.bvh.traverse import traverse_nearest
    from raytracing_tests_tpu.ops.intersect import intersect_brute
    from raytracing_tests_tpu.scene import examples

    scene, _ = examples.bvh_grid_scene(side=5)
    bvh = build_lbvh_native(scene)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-8, 8, (256, 3)).astype(np.float32))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ratio = jnp.zeros(256)
    t_lim = jnp.full((256,), 32000.0)
    hb = intersect_brute(scene, o, d, ratio, t_lim)
    ht = traverse_nearest(bvh, scene, o, d, ratio, t_lim)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_array_equal(np.asarray(hb.obj)[m], np.asarray(ht.obj)[m])


def test_native_noise_properties():
    tex = native.noise_texture_host(64, 48, scale=6.0, octaves=4, kind="fbm")
    assert tex.shape == (64, 48)
    assert tex.min() >= 0.0 and tex.max() <= 1.0
    assert tex.std() > 0.05  # actually textured, not flat
    # deterministic
    tex2 = native.noise_texture_host(64, 48, scale=6.0, octaves=4, kind="fbm")
    np.testing.assert_array_equal(tex, tex2)


def test_native_noise_kinds_differ():
    a = native.noise_texture_host(32, 32, kind="simplex")
    b = native.noise_texture_host(32, 32, kind="turbulence")
    assert not np.allclose(a, b)
