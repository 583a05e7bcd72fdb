"""Scene-of-arrays (SoA) scene representation and camera model.

The reference ships scene data to kernels as RGBA32F textures with a fixed
7-texel-per-object layout (``In-Next-Week/base.h:106-144`` +
``FillHitData`` in ``01_BoundingVolumeHierarchy/computeShaderSrc.glsl``):
position, rotation matrix, scale, delta-position, type, then material
(refractive index, refractivity, reflectivity, scatter terms, color) and, in
later workloads, texture index and emissive flag.

The TPU-native equivalent is a struct-of-arrays pytree resident in HBM:
each field is a ``(N, ...)`` array padded to a static capacity with a
``valid`` mask, so every jit trace has static shapes and the whole scene can
be replicated per chip with one ``device_put``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from raytracing_tests_tpu.core import geometry, linalg

ELLIPSOID = geometry.ELLIPSOID
CUBOID = geometry.CUBOID

_PAD = 8  # pad object count to a multiple of this for friendly layouts


@struct.dataclass
class Scene:
    """Static-capacity SoA scene. All arrays share leading dim N (padded)."""

    # Transform (reference Transform_Buff, In-Next-Week/base.h:12-18)
    position: jnp.ndarray  # (N, 3) f32
    rotation: jnp.ndarray  # (N, 3, 3) f32 world-from-local
    scale: jnp.ndarray  # (N, 3) f32
    delta_position: jnp.ndarray  # (N, 3) f32 motion since last "frame"
    obj_type: jnp.ndarray  # (N,) i32: 1=ellipsoid, 2=cuboid, 0=padding

    # Material (reference Material struct, 01_BVH glsl:57-66 + texturing/lights)
    color: jnp.ndarray  # (N, 3) f32 albedo
    refractive_index: jnp.ndarray  # (N,) f32
    refractivity: jnp.ndarray  # (N,) f32 fraction of light refracted
    reflectivity: jnp.ndarray  # (N,) f32 fraction of light reflected
    scatter_refract: jnp.ndarray  # (N,) f32 tan(cone) of refracted scatter
    scatter_reflect: jnp.ndarray  # (N,) f32 tan(cone) of reflected scatter
    texture_index: jnp.ndarray  # (N,) i32, 0 = untextured, else 1-based atlas id
    emissive: jnp.ndarray  # (N,) bool

    valid: jnp.ndarray  # (N,) bool padding mask

    # Cube-sphere texture atlas: (T, H, 6*W, 3) f32 in [0,1]; T >= 1 (slot 0 unused
    # filler so texture_index can stay 1-based like the reference).
    textures: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    def world_aabbs(self):
        """Per-object conservative world AABBs including motion sweep."""
        last = self.position - self.delta_position
        return geometry.object_aabb(self.position, last, self.rotation, self.scale)


@struct.dataclass
class Camera:
    """Pinhole + thin-lens camera (reference RT_Base camera,
    ``In-Next-Week/base.h:256-282`` and ray-gen in ``01_BVH`` glsl:364-411).

    ``focus_dist`` is a vector to support the reference's multi-focus arrays;
    single-focus uses ``focus_dist[0]``.  ``ortho_height > 0`` switches to an
    orthographic projection (the reference's ``OrthographicCamera``,
    ``GLCore/Util/OrthographicCamera.h:7-33`` — used by its example layer):
    parallel rays from a ``ortho_height``-tall view plane; fov/aperture are
    ignored.
    """

    position: jnp.ndarray  # (3,)
    direction: jnp.ndarray  # (3,) normalized look direction
    fov_y: jnp.ndarray  # () radians
    aperture: jnp.ndarray  # () lens diameter
    focus_dist: jnp.ndarray  # (K,)
    ortho_height: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros(()))

    @classmethod
    def make(cls, position, direction, fov_y_deg=60.0, aperture=0.0, focus_dist=10.0,
             ortho_height=0.0):
        # NOTE: focus_dist == 1.0 is degenerate under the reference's DOF pivot
        # (lookAt - newTip becomes the zero vector); keep it > 1.
        fd = np.atleast_1d(np.asarray(focus_dist, np.float32))
        d = np.asarray(direction, np.float32)
        d = d / np.linalg.norm(d)
        return cls(
            position=jnp.asarray(position, jnp.float32),
            direction=jnp.asarray(d),
            fov_y=jnp.asarray(np.deg2rad(fov_y_deg), jnp.float32),
            aperture=jnp.asarray(aperture, jnp.float32),
            focus_dist=jnp.asarray(fd),
            ortho_height=jnp.asarray(ortho_height, jnp.float32),
        )

    @classmethod
    def orthographic(cls, position, direction, height=2.0):
        return cls.make(position, direction, ortho_height=height)

    @classmethod
    def from_pitch_yaw(cls, position, pitch_deg, yaw_deg, **kw):
        """Reference-style pitch/yaw camera (``In-Next-Week/base.h:262-270``)."""
        p, y = np.deg2rad(pitch_deg), np.deg2rad(yaw_deg)
        d = np.array(
            [np.cos(p) * np.cos(y), np.sin(p), np.cos(p) * np.sin(y)], np.float32
        )
        return cls.make(position, d, **kw)


@dataclasses.dataclass
class _Obj:
    position: tuple
    rotation_deg: tuple
    scale: tuple
    delta_position: tuple
    obj_type: int
    color: tuple
    refractive_index: float
    refractivity: float
    reflectivity: float
    scatter_refract: float
    scatter_reflect: float
    texture_index: int
    emissive: bool


class SceneBuilder:
    """Host-side scene assembly -> padded SoA ``Scene``.

    Replaces the reference's ImGui-driven geometry vectors + texture upload
    path (``RT_Base::OnUpdateBase``, ``In-Next-Week/base.h:106-144``).
    """

    def __init__(self):
        self._objs: list[_Obj] = []
        self._textures: list[np.ndarray] = []
        self._tex_hw: Optional[tuple] = None

    def __len__(self):
        return len(self._objs)

    def add(
        self,
        position,
        scale,
        obj_type=ELLIPSOID,
        rotation_deg=(0.0, 0.0, 0.0),
        delta_position=(0.0, 0.0, 0.0),
        color=(1.0, 1.0, 1.0),
        refractive_index=1.5,
        refractivity=0.0,
        reflectivity=0.0,
        scatter_refract=0.0,
        scatter_reflect=0.0,
        texture_index=0,
        emissive=False,
    ):
        self._objs.append(
            _Obj(
                tuple(position),
                tuple(rotation_deg),
                tuple(scale),
                tuple(delta_position),
                int(obj_type),
                tuple(color),
                float(refractive_index),
                float(refractivity),
                float(reflectivity),
                float(scatter_refract),
                float(scatter_reflect),
                int(texture_index),
                bool(emissive),
            )
        )
        return len(self._objs) - 1

    def add_sphere(self, center, radius, **kw):
        return self.add(center, (radius, radius, radius), ELLIPSOID, **kw)

    def add_box(self, center, size, **kw):
        return self.add(center, size, CUBOID, **kw)

    # Shirley-style material sugar -------------------------------------------------
    def add_lambertian(self, center, radius, albedo, scatter=1.0, **kw):
        """Diffuse: all light reflected with a wide scatter cone."""
        return self.add_sphere(
            center, radius, color=albedo, reflectivity=1.0, scatter_reflect=scatter, **kw
        )

    def add_metal(self, center, radius, albedo, fuzz=0.0, **kw):
        return self.add_sphere(
            center, radius, color=albedo, reflectivity=1.0, scatter_reflect=fuzz, **kw
        )

    def add_dielectric(self, center, radius, ior=1.5, albedo=(1.0, 1.0, 1.0), **kw):
        return self.add_sphere(
            center,
            radius,
            color=albedo,
            refractive_index=ior,
            refractivity=0.9,
            reflectivity=0.1,
            **kw,
        )

    def add_light(self, center, scale, color=(1.0, 1.0, 1.0), obj_type=ELLIPSOID, **kw):
        return self.add(center, scale, obj_type, color=color, emissive=True, **kw)

    def add_texture(self, image: np.ndarray):
        """Register a cube-sphere atlas texture (H, 6W, 3) float in [0,1].

        Returns the 1-based texture index (reference convention,
        ``03_Solid_And_Noise_Textures/computeShaderSrc.glsl:409``).
        """
        image = np.asarray(image, np.float32)
        assert image.ndim == 3 and image.shape[-1] == 3, image.shape
        if self._tex_hw is None:
            self._tex_hw = image.shape[:2]
        assert image.shape[:2] == self._tex_hw, "all atlas textures must share a shape"
        self._textures.append(image)
        return len(self._textures)

    def build(self, capacity: Optional[int] = None) -> Scene:
        n = len(self._objs)
        assert n > 0, "empty scene"
        cap = capacity or -(-n // _PAD) * _PAD
        assert cap >= n

        def field(fn, shape, dtype=np.float32, pad_value=0):
            # Padding rows use benign values (unit scale/RI): they never hit
            # (valid = False, obj_type = 0) but are still *evaluated* by the
            # dense sweep, and zeros would make masked-lane gradients NaN.
            out = np.full((cap,) + shape, pad_value, dtype)
            for i, o in enumerate(self._objs):
                out[i] = fn(o)
            return jnp.asarray(out)

        rot = np.zeros((cap, 3, 3), np.float32)
        rot[:] = np.eye(3)
        degs = np.array([o.rotation_deg for o in self._objs], np.float32)
        if degs.any():
            # ONE batched device call: the old per-object
            # rotation_from_euler round-trip cost ~80 ms of tunnel
            # dispatch per object (a 488-sphere scene took 39 s to BUILD
            # — round-5 find).  rotation_from_euler is batch-polymorphic,
            # so per-element results are the same backend cos/sin/matmul.
            rot[:n] = np.asarray(
                linalg.rotation_from_euler(jnp.asarray(degs)))
        # all-identity scenes never touch the device here

        textures = None
        if self._textures:
            textures = jnp.asarray(np.stack([np.zeros_like(self._textures[0])] + self._textures))

        return Scene(
            position=field(lambda o: o.position, (3,)),
            rotation=jnp.asarray(rot),
            scale=field(lambda o: o.scale, (3,), pad_value=1),
            delta_position=field(lambda o: o.delta_position, (3,)),
            obj_type=field(lambda o: o.obj_type, (), np.int32),
            color=field(lambda o: o.color, (3,)),
            refractive_index=field(lambda o: o.refractive_index, (), pad_value=1),
            refractivity=field(lambda o: o.refractivity, ()),
            reflectivity=field(lambda o: o.reflectivity, ()),
            scatter_refract=field(lambda o: o.scatter_refract, ()),
            scatter_reflect=field(lambda o: o.scatter_reflect, ()),
            texture_index=field(lambda o: o.texture_index, (), np.int32),
            emissive=field(lambda o: o.emissive, (), bool),
            valid=jnp.asarray(np.arange(cap) < n),
            textures=textures,
        )
