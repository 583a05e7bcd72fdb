"""Stackless lane-parallel LBVH traversal.

The reference's GLSL traversal keeps a 40-float stack per thread with
push/pop macros (``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:80-108``)
— per-lane stacks don't exist on the VPU, so this is a parent-link state
machine (Hapala-style) instead: every lane carries (node, state) and the whole
batch advances in lockstep under one ``lax.while_loop``; finished lanes idle
until all are done.  Transitions per iteration:

  DOWN  at an internal hit node  -> left child (DOWN)
  DOWN  at a leaf / missed node  -> (UP)                [leaf also intersects]
  UP    from a left child        -> right sibling (DOWN)
  UP    from a right child       -> parent (UP); root -> done

Node AABBs are pruned against the lane's current best t (the reference's
``t_limit`` argument to ``TestIntersectAABB``, glsl:187-210).

STATUS: reference-semantics ORACLE, not a performance path.  Measured on a
real v5e at 1,025 objects (scripts/bvh1k.py): 54.6 s/frame vs 66 ms for the
grouped block-culling sweep — the lockstep walk pays a full scene gather +
primitive test per lane per iteration, and per-lane divergence makes every
lane wait for the deepest.  Block-granular culling (kernels/sweep.py
grouped mode, generic table) is the TPU-native answer at every scale we
measured; this module stays as the structural mirror of the reference
traversal and as an independent cross-check of the sweep results
(tests/test_bvh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.bvh.build import LBVH
from raytracing_tests_tpu.core import geometry, linalg
from raytracing_tests_tpu.ops.intersect import BIG_T, Hit
from raytracing_tests_tpu.scene.types import Scene

_DOWN, _UP = 0, 1


def _leaf_hit_t(scene: Scene, obj, o, d, time_ratio):
    """Primitive t for one gathered object per lane (world-space rays)."""
    pos = scene.position[obj]
    rot = scene.rotation[obj]
    scale = scene.scale[obj]
    dp = scene.delta_position[obj]
    otype = scene.obj_type[obj]
    shift = (1.0 - time_ratio)[:, None] * dp
    lo = linalg.apply_rotation_t(rot, o - pos + shift)
    ld = linalg.apply_rotation_t(rot, d)
    t = geometry.ray_primitive_t(lo, ld, scale, otype)
    return jnp.where(scene.valid[obj] & (t > 0.0), t, BIG_T)


def _traverse(bvh: LBVH, scene: Scene, o, d, time_ratio, t_limit):
    """Shared core: nearest (t, obj) per lane, both BIG_T/-1 on miss."""
    B = o.shape[0]
    n_nodes = bvh.left.shape[0]
    max_steps = 3 * n_nodes + 2

    init = (
        jnp.zeros((B,), jnp.int32),  # cur node (root = 0)
        jnp.full((B,), _DOWN, jnp.int32),  # state
        jnp.zeros((B,), bool),  # done
        jnp.minimum(jnp.full((B,), BIG_T), t_limit),  # best t (also prunes)
        jnp.full((B,), -1, jnp.int32),  # best obj
        jnp.int32(0),  # step counter
    )

    def cond(carry):
        _, _, done, _, _, step = carry
        return (~jnp.all(done)) & (step < max_steps)

    def body(carry):
        cur, state, done, t_best, obj_best, step = carry
        is_down = (state == _DOWN) & ~done

        bb_lo = bvh.bb_min[cur]
        bb_hi = bvh.bb_max[cur]
        aabb_hit = geometry.ray_aabb_hit(bb_lo, bb_hi, o, d, t_best)
        obj = bvh.obj_id[cur]
        is_leaf = obj >= 0

        # Leaf intersection (masked; every lane pays one primitive test per
        # iteration — the price of lockstep).
        t_leaf = _leaf_hit_t(scene, jnp.maximum(obj, 0), o, d, time_ratio)
        take = is_down & is_leaf & aabb_hit & (t_leaf < t_best)
        t_best = jnp.where(take, t_leaf, t_best)
        obj_best = jnp.where(take, obj, obj_best)

        # DOWN transitions.
        descend = is_down & ~is_leaf & aabb_hit
        to_up = is_down & ~descend  # leaf or missed internal

        # UP transitions.
        is_up = (state == _UP) & ~done
        par = bvh.parent[cur]
        at_root = par < 0
        was_left = jnp.where(at_root, False, bvh.left[jnp.maximum(par, 0)] == cur)

        new_done = done | (is_up & at_root)
        new_cur = jnp.where(
            descend,
            bvh.left[cur],
            jnp.where(
                is_up & ~at_root & was_left,
                bvh.right[jnp.maximum(par, 0)],
                jnp.where(is_up & ~at_root & ~was_left, par, cur),
            ),
        )
        new_state = jnp.where(
            descend | (is_up & ~at_root & was_left),
            _DOWN,
            jnp.where(to_up | (is_up & ~at_root & ~was_left), _UP, state),
        )
        return new_cur, new_state, new_done, t_best, obj_best, step + 1

    _, _, _, t_best, obj_best, _ = jax.lax.while_loop(cond, body, init)
    hit = (obj_best >= 0) & (t_best < t_limit)
    return jnp.where(hit, t_best, BIG_T), jnp.where(hit, obj_best, -1)


def traverse_nearest(bvh: LBVH, scene: Scene, o, d, time_ratio, t_limit) -> Hit:
    """Nearest-hit query with the same ``Hit`` contract as
    ``ops.intersect.intersect_brute`` (tested equal)."""
    t, obj = _traverse(bvh, scene, o, d, time_ratio, t_limit)
    hit = obj >= 0
    obj_safe = jnp.maximum(obj, 0)
    t_safe = jnp.where(hit, t, 1.0)  # bounded for miss lanes (grad hygiene)

    rot = scene.rotation[obj_safe]
    scale = scene.scale[obj_safe]
    otype = scene.obj_type[obj_safe]
    pos = scene.position[obj_safe]
    dp = scene.delta_position[obj_safe]
    shift = (1.0 - time_ratio)[:, None] * dp
    lo = linalg.apply_rotation_t(rot, o - pos + shift)
    ld = linalg.apply_rotation_t(rot, d)
    p_local = lo + t_safe[:, None] * ld
    n_local = geometry.primitive_normal(p_local, scale, otype)
    n_world = linalg.apply_rotation(rot, n_local)
    return Hit(
        t=t_safe, obj=obj_safe, hit=hit, normal=n_world, local_pos=p_local / scale
    )


def traverse_nearest_obj(bvh: LBVH, scene: Scene, o, d, time_ratio, t_limit):
    """Occlusion query: index of nearest object before ``t_limit`` (-1 none),
    mirroring ``ops.intersect.occluded_nearest_obj``."""
    _, obj = _traverse(bvh, scene, o, d, time_ratio, t_limit)
    return obj


def traverse_point_ri(bvh: LBVH, scene: Scene, point, time_ratio):
    """Surrounding-refractive-index point query via the BVH.

    The reference runs a second top-down traversal accumulating the RI of
    every leaf whose AABB contains the point
    (``IfInsideAABBAndLeaf_TryAccumulateRI``, ``01_BVH glsl:268-345,
    484-502``); this walks the same tree but tests the *exact* primitive at
    leaves (matching ``ops.intersect.surrounding_refractive_index``, which
    treats the AABB walk as a culling detail).  O(depth) instead of O(N).
    """
    B = point.shape[0]
    n_nodes = bvh.left.shape[0]
    max_steps = 3 * n_nodes + 2

    init = (
        jnp.zeros((B,), jnp.int32),  # cur
        jnp.full((B,), _DOWN, jnp.int32),
        jnp.zeros((B,), bool),  # done
        jnp.zeros((B,), jnp.float32),  # RI accumulator
        jnp.zeros((B,), jnp.float32),  # containment count
        jnp.int32(0),
    )

    def cond(carry):
        _, _, done, _, _, step = carry
        return (~jnp.all(done)) & (step < max_steps)

    def body(carry):
        cur, state, done, acc, cnt, step = carry
        is_down = (state == _DOWN) & ~done

        inside_aabb = jnp.all(
            (point >= bvh.bb_min[cur]) & (point <= bvh.bb_max[cur]), axis=-1
        )
        obj = bvh.obj_id[cur]
        is_leaf = obj >= 0

        # Exact containment test at leaves (masked every iteration).
        obj_s = jnp.maximum(obj, 0)
        shift = (1.0 - time_ratio)[:, None] * scene.delta_position[obj_s]
        local = linalg.apply_rotation_t(
            scene.rotation[obj_s], point - scene.position[obj_s] + shift
        ) / scene.scale[obj_s]
        inside = (
            geometry.point_in_unit_primitive(local, scene.obj_type[obj_s])
            & scene.valid[obj_s]
            # RI-1 containers are air (convention shared with the CPU
            # oracle and every device probe).
            & (scene.refractive_index[obj_s] != 1.0)
        )
        take = is_down & is_leaf & inside_aabb & inside
        acc = acc + jnp.where(take, scene.refractive_index[obj_s], 0.0)
        cnt = cnt + take.astype(jnp.float32)

        descend = is_down & ~is_leaf & inside_aabb
        is_up = (state == _UP) & ~done
        par = bvh.parent[cur]
        at_root = par < 0
        was_left = jnp.where(at_root, False, bvh.left[jnp.maximum(par, 0)] == cur)

        new_done = done | (is_up & at_root)
        new_cur = jnp.where(
            descend,
            bvh.left[cur],
            jnp.where(
                is_up & ~at_root & was_left,
                bvh.right[jnp.maximum(par, 0)],
                jnp.where(is_up & ~at_root & ~was_left, par, cur),
            ),
        )
        new_state = jnp.where(
            descend | (is_up & ~at_root & was_left),
            _DOWN,
            jnp.where(
                (is_down & ~descend) | (is_up & ~at_root & ~was_left), _UP, state
            ),
        )
        return new_cur, new_state, new_done, acc, cnt, step + 1

    _, _, _, acc, cnt, _ = jax.lax.while_loop(cond, body, init)
    return jnp.where(acc > 1.0, acc / jnp.maximum(cnt, 1.0), 1.0)
