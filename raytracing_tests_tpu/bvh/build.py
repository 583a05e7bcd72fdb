"""Jitted on-device LBVH build.

Pipeline (all vectorized jax, no host round-trips):
  1. per-object world AABBs incl. motion sweep (``Transform_Data::
     CalculateBBMinMax``, ``In-Next-Week/base.h:24-42``),
  2. 30-bit Morton codes of centroids normalized to the scene AABB
     (``LBVH/lbvh.h:11-30, 95-109``),
  3. sort by (morton, AABB size, index) — the reference's tie-break
     (``lbvh.h:112-120``) plus an index to make order deterministic,
  4. Karras 2012 internal-node range/split computation (replaces the
     reference's bottom-up level-queue build, ``lbvh.h:153-210``; same tree
     family, but every node is computed independently = embarrassingly
     parallel on the VPU),
  5. internal-node AABBs as range min/max over sorted leaf AABBs using a
     sparse table (log2 N levels) instead of atomics-based upward merging —
     a Karras range node's AABB is exactly the AABB of its contiguous
     sorted-leaf range.

Node layout (SoA, 2N-1 nodes): internal nodes occupy [0, N-2] with node 0 the
root; leaf k is node (N-1) + k and stores the *original* object id.  The
``parent`` array enables the stackless traversal (the reference stores the
same parent pointer in ``BVHNodeBuff.rightData``, ``lbvh.h:48-54``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from raytracing_tests_tpu.scene.types import Scene


@struct.dataclass
class LBVH:
    bb_min: jnp.ndarray  # (2N-1, 3)
    bb_max: jnp.ndarray  # (2N-1, 3)
    left: jnp.ndarray  # (2N-1,) i32 child node index (-1 for leaves)
    right: jnp.ndarray  # (2N-1,) i32
    parent: jnp.ndarray  # (2N-1,) i32 (-1 for root)
    obj_id: jnp.ndarray  # (2N-1,) i32 original object index (-1 for internal)

    @property
    def n_leaves(self) -> int:
        return (self.left.shape[0] + 1) // 2

    @property
    def n_internal(self) -> int:
        return self.n_leaves - 1


def _expand_bits(v):
    """Insert two zero bits after each of the low 10 bits (``lbvh.h:11-21``)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(xyz01):
    """30-bit Morton code of points in [0,1]^3 (``lbvh.h:23-30``)."""
    q = jnp.clip(xyz01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    x = _expand_bits(q[..., 0])
    y = _expand_bits(q[..., 1])
    z = _expand_bits(q[..., 2])
    return (x << 2) | (y << 1) | z


def _make_delta(codes, n):
    """Karras delta(i, j): common-prefix length of sorted codes, with equal
    codes disambiguated by position (delta = 32 + clz(i ^ j)); -1 off-range."""

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = codes[i] ^ codes[jc]
        xi = (i ^ jc).astype(jnp.uint32)
        d = jnp.where(x == 0, 32 + jax.lax.clz(xi), jax.lax.clz(x)).astype(jnp.int32)
        return jnp.where(valid, d, -1)

    return delta


def build_lbvh(scene: Scene) -> LBVH:
    """Build the LBVH over all ``capacity`` objects.  Padding rows collapse to
    a degenerate far-corner box (zero surface; their leaves are also guarded
    by ``obj_type == 0`` at intersection time)."""
    n = scene.capacity
    assert n >= 2, "LBVH needs at least 2 objects"
    lo, hi = scene.world_aabbs()
    valid = scene.valid
    big = jnp.max(jnp.where(valid[:, None], hi, -jnp.inf), axis=0)
    lo = jnp.where(valid[:, None], lo, big)
    hi = jnp.where(valid[:, None], hi, big)

    scene_lo = jnp.min(lo, axis=0)
    scene_hi = jnp.max(hi, axis=0)
    centroid = (lo + hi) * 0.5
    extent = jnp.maximum(scene_hi - scene_lo, 1e-12)
    codes = morton3d((centroid - scene_lo) / extent)  # (N,) uint32

    # Sorted order: morton asc, then AABB size, then index (reference
    # tie-break lbvh.h:112-120; lexsort's last key is the primary one).
    size = jnp.sum(hi - lo, axis=-1)
    order = jnp.lexsort((size, codes)).astype(jnp.int32)
    codes_s = codes[order]
    lo_s, hi_s = lo[order], hi[order]

    n_int = n - 1
    i = jnp.arange(n_int, dtype=jnp.int32)
    delta = _make_delta(codes_s, n)

    d = jnp.where(delta(i, i + 1) > delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # Range-length upper bound by doubling (max length n => ~log2(n) + 2 steps).
    n_dbl = max(2, n.bit_length() + 1)
    lmax = jax.lax.fori_loop(
        0,
        n_dbl,
        lambda _, lmax: jnp.where(delta(i, i + lmax * d) > delta_min, lmax * 2, lmax),
        jnp.full((n_int,), 2, jnp.int32),
    )

    # Binary-search the exact far end j = i + l*d.
    def bin_body(s, l):
        t = lmax >> (s + 1)
        probe = delta(i, i + (l + t) * d) > delta_min
        return jnp.where((t > 0) & probe, l + t, l)

    l = jax.lax.fori_loop(0, n_dbl + 1, bin_body, jnp.zeros((n_int,), jnp.int32))
    j = i + l * d

    # Split search: find the highest position sharing > delta(i, j) prefix.
    delta_node = delta(i, j)

    def split_body(_, carry):
        split, t = carry
        probe = delta(i, i + (split + t) * d) > delta_node
        split = jnp.where((t >= 1) & probe, split + t, split)
        return split, jnp.where(t > 1, (t + 1) // 2, 0)

    split, _ = jax.lax.fori_loop(
        0, n_dbl + 1, split_body, (jnp.zeros((n_int,), jnp.int32), (l + 1) // 2)
    )
    gamma = i + split * d + jnp.minimum(d, 0)

    leaf_base = n_int  # leaf k lives at node leaf_base + k
    first, last = jnp.minimum(i, j), jnp.maximum(i, j)
    left_child = jnp.where(first == gamma, leaf_base + gamma, gamma)
    right_child = jnp.where(last == gamma + 1, leaf_base + gamma + 1, gamma + 1)

    total = 2 * n - 1
    left = jnp.full((total,), -1, jnp.int32).at[:n_int].set(left_child)
    right = jnp.full((total,), -1, jnp.int32).at[:n_int].set(right_child)
    parent = jnp.full((total,), -1, jnp.int32)
    parent = parent.at[left_child].set(i)
    parent = parent.at[right_child].set(i)
    obj_id = jnp.full((total,), -1, jnp.int32).at[leaf_base:].set(order)

    bb_lo_int, bb_hi_int = _range_aabb(lo_s, hi_s, first, last)
    bb_min = jnp.concatenate([bb_lo_int, lo_s])
    bb_max = jnp.concatenate([bb_hi_int, hi_s])
    return LBVH(
        bb_min=bb_min, bb_max=bb_max, left=left, right=right, parent=parent, obj_id=obj_id
    )


def _range_aabb(lo_s, hi_s, first, last):
    """Min/max of leaf AABBs over inclusive index ranges: sparse table
    (log2 N levels), then two overlapping power-of-two windows per query."""
    n = lo_s.shape[0]
    levels = max(1, n.bit_length())
    lo_tab, hi_tab = [lo_s], [hi_s]
    for k in range(1, levels):
        half = 1 << (k - 1)
        prev_lo, prev_hi = lo_tab[-1], hi_tab[-1]
        pad_lo = jnp.repeat(prev_lo[-1:], half, axis=0)
        pad_hi = jnp.repeat(prev_hi[-1:], half, axis=0)
        lo_tab.append(jnp.minimum(prev_lo, jnp.concatenate([prev_lo[half:], pad_lo])))
        hi_tab.append(jnp.maximum(prev_hi, jnp.concatenate([prev_hi[half:], pad_hi])))
    lo_tab = jnp.stack(lo_tab)  # (L, N, 3)
    hi_tab = jnp.stack(hi_tab)

    length = (last - first + 1).astype(jnp.float32)
    k = jnp.floor(jnp.log2(jnp.maximum(length, 1.0))).astype(jnp.int32)
    b = last - (1 << k) + 1
    lo_q = jnp.minimum(lo_tab[k, first], lo_tab[k, b])
    hi_q = jnp.maximum(hi_tab[k, first], hi_tab[k, b])
    return lo_q, hi_q
