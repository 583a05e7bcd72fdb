"""Host-side (C++) LBVH build producing the same ``LBVH`` pytree as the
on-device builder — the direct counterpart of the reference's CPU
``LBVH::ConstructLBVH_Buff`` (``lbvh.h:215-269``), useful when the TPU is
saturated with rendering and the host cores are idle.

Tested structurally identical to ``build.build_lbvh`` (same sort keys, same
Karras linking)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.bvh.build import LBVH
from raytracing_tests_tpu.scene.types import Scene


def build_lbvh_native(scene: Scene) -> LBVH:
    """Build on host via ``native.rt_build_lbvh``; mirrors the device
    builder's padding collapse (invalid rows -> scene-max corner)."""
    from raytracing_tests_tpu import native

    lo, hi = (np.asarray(x) for x in scene.world_aabbs())
    valid = np.asarray(scene.valid)
    if not valid.all():
        big = hi[valid].max(axis=0)
        lo = np.where(valid[:, None], lo, big)
        hi = np.where(valid[:, None], hi, big)
    out = native.build_lbvh_host(lo, hi)
    return LBVH(
        bb_min=jnp.asarray(out["bb_min"]),
        bb_max=jnp.asarray(out["bb_max"]),
        left=jnp.asarray(out["left"]),
        right=jnp.asarray(out["right"]),
        parent=jnp.asarray(out["parent"]),
        obj_id=jnp.asarray(out["obj_id"]),
    )
