"""LBVH build invariants + traversal parity with the dense sweep.

The reference asserts node count == 2N-1 at upload (``In-Next-Week/base.h:136``)
and offers a "Print Hierarchy tree" debug dump (``base.h:514-539``); here the
tree is validated structurally and the traversal is checked hit-for-hit
against ``intersect_brute`` (both share the Hit contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.bvh import build_lbvh, traverse_nearest
from raytracing_tests_tpu.bvh.traverse import traverse_nearest_obj
from raytracing_tests_tpu.ops.intersect import intersect_brute, occluded_nearest_obj
from raytracing_tests_tpu.ops.render import RenderConfig, render_jit
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.scene.types import SceneBuilder


def _tree_ok(bvh):
    n = bvh.n_leaves
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    parent = np.asarray(bvh.parent)
    obj_id = np.asarray(bvh.obj_id)

    assert left.shape[0] == 2 * n - 1  # reference invariant base.h:136
    assert parent[0] == -1  # node 0 is the root
    # each leaf holds a distinct object id
    leaves = obj_id[n - 1 :]
    assert sorted(leaves.tolist()) == list(range(n))
    # children/parent are mutually consistent
    for i in range(n - 1):
        assert parent[left[i]] == i and parent[right[i]] == i
    # every node is reachable from the root exactly once
    seen = set()
    stack = [0]
    while stack:
        k = stack.pop()
        assert k not in seen
        seen.add(k)
        if left[k] >= 0:
            stack += [int(left[k]), int(right[k])]
    assert len(seen) == 2 * n - 1
    # parent AABBs contain child AABBs
    bb_min = np.asarray(bvh.bb_min)
    bb_max = np.asarray(bvh.bb_max)
    for i in range(n - 1):
        for c in (left[i], right[i]):
            assert np.all(bb_min[i] <= bb_min[c] + 1e-5)
            assert np.all(bb_max[i] >= bb_max[c] - 1e-5)


@pytest.mark.parametrize("n_obj", [2, 3, 7, 33])
def test_build_structure(rng, n_obj):
    b = SceneBuilder()
    for _ in range(n_obj):
        b.add_sphere(tuple(rng.uniform(-5, 5, 3)), float(rng.uniform(0.1, 1.0)))
    scene = b.build(capacity=n_obj)  # no padding
    _tree_ok(jax.jit(build_lbvh)(scene))


def test_build_structure_with_padding(rng):
    b = SceneBuilder()
    for _ in range(5):
        b.add_sphere(tuple(rng.uniform(-5, 5, 3)), float(rng.uniform(0.1, 1.0)))
    scene = b.build()  # padded to 8
    _tree_ok(build_lbvh(scene))


def _random_rays(rng, n, spread=6.0):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_traversal_matches_brute(rng):
    scene, _ = examples.bvh_grid_scene(side=6)
    bvh = build_lbvh(scene)
    o, d = _random_rays(rng, 512, spread=8.0)
    ratio = jnp.zeros(512)
    t_lim = jnp.full((512,), 32000.0)
    hb = intersect_brute(scene, o, d, ratio, t_lim)
    ht = traverse_nearest(bvh, scene, o, d, ratio, t_lim)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(hb.obj)[m], np.asarray(ht.obj)[m])
    # Normals may flip faces for hits within f32 noise of a cuboid edge;
    # require near-total agreement rather than bitwise equality.
    same = np.all(
        np.isclose(np.asarray(hb.normal)[m], np.asarray(ht.normal)[m], atol=1e-5),
        axis=-1,
    )
    assert same.mean() > 0.99, same.mean()


def test_traversal_matches_brute_motion(rng):
    scene, _ = examples.motion_blur_scene()
    bvh = build_lbvh(scene)
    o, d = _random_rays(rng, 256, spread=4.0)
    ratio = jnp.asarray(rng.uniform(0, 1, 256).astype(np.float32))
    t_lim = jnp.full((256,), 32000.0)
    hb = intersect_brute(scene, o, d, ratio, t_lim)
    ht = traverse_nearest(bvh, scene, o, d, ratio, t_lim)
    m = np.asarray(hb.hit)
    np.testing.assert_array_equal(m, np.asarray(ht.hit))
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-4)


def test_occlusion_matches_brute(rng):
    scene, _ = examples.bvh_grid_scene(side=5)
    bvh = build_lbvh(scene)
    o, d = _random_rays(rng, 256, spread=8.0)
    ratio = jnp.zeros(256)
    t_lim = jnp.full((256,), 10.0)
    a = np.asarray(occluded_nearest_obj(scene, o, d, ratio, t_lim))
    b = np.asarray(traverse_nearest_obj(bvh, scene, o, d, ratio, t_lim))
    np.testing.assert_array_equal(a, b)


def test_render_with_bvh_intersector_matches_brute():
    scene, cam = examples.bvh_grid_scene(side=4)
    cfg_b = RenderConfig(width=24, height=16, spp=2, max_bounces=3)
    cfg_t = RenderConfig(width=24, height=16, spp=2, max_bounces=3, intersector="bvh")
    rb = render_jit(scene, cam, cfg_b)
    rt = render_jit(scene, cam, cfg_t)
    np.testing.assert_allclose(
        np.asarray(rb["image"]), np.asarray(rt["image"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rb["depth"]), np.asarray(rt["depth"]), atol=1e-4
    )
