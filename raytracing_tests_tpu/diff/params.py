"""The differentiable subset of the scene SoA.

``Scene`` mixes float fields (positions, materials) with structural ints
(obj_type, texture_index) and masks; gradients only make sense for the float
leaves.  ``SceneParams`` is that float sub-pytree — the optimization variable
— and ``apply_params`` grafts it back onto a template scene.

Gradable parameters (BASELINE.json): sphere centers (position), radii
(scale), albedo (color), fuzz (scatter_reflect/refract), IOR
(refractive_index), plus reflect/refract fractions, motion delta and the
texture atlas itself.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from raytracing_tests_tpu.scene.types import Scene

FLOAT_FIELDS = (
    "position",
    "scale",
    "delta_position",
    "color",
    "refractive_index",
    "refractivity",
    "reflectivity",
    "scatter_refract",
    "scatter_reflect",
)


@struct.dataclass
class SceneParams:
    position: jnp.ndarray
    scale: jnp.ndarray
    delta_position: jnp.ndarray
    color: jnp.ndarray
    refractive_index: jnp.ndarray
    refractivity: jnp.ndarray
    reflectivity: jnp.ndarray
    scatter_refract: jnp.ndarray
    scatter_reflect: jnp.ndarray
    textures: Optional[jnp.ndarray] = None


def extract_params(scene: Scene) -> SceneParams:
    return SceneParams(
        **{f: getattr(scene, f) for f in FLOAT_FIELDS}, textures=scene.textures
    )


def apply_params(scene: Scene, params: SceneParams) -> Scene:
    """Template scene + params -> scene (structural fields from the template)."""
    return scene.replace(
        **{f: getattr(params, f) for f in FLOAT_FIELDS}, textures=params.textures
    )


def params_mask(scene: Scene, *trainable_fields: str) -> SceneParams:
    """0/1 mask pytree selecting which fields ``make_train_step`` updates,
    e.g. ``params_mask(scene, "color", "scatter_reflect")``."""
    unknown = set(trainable_fields) - set(FLOAT_FIELDS) - {"textures"}
    assert not unknown, f"unknown fields: {unknown}"
    p = extract_params(scene)
    return SceneParams(
        **{
            f: jnp.full_like(getattr(p, f), 1.0 if f in trainable_fields else 0.0)
            for f in FLOAT_FIELDS
        },
        textures=None
        if p.textures is None
        else jnp.full_like(p.textures, 1.0 if "textures" in trainable_fields else 0.0),
    )
