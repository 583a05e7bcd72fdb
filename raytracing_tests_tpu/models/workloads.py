"""All registered workloads — one per reference test (SURVEY.md §2.5).

| name          | mirrors reference test                              |
|---------------|-----------------------------------------------------|
| uv-image      | CS-00 Basic Compute Shader / IOW-00 Image           |
| blur          | CS-01 Blur                                          |
| evolve        | CS-02 Evolving Pics (APT)                           |
| buffer        | CS-03 SSBO                                          |
| sphere        | IOW-01 Adding Sphere                                |
| groups        | IOW-02 Groups                                       |
| materials     | IOW-03 Shadows and Materials                        |
| motion-blur   | INW-00 Motion Blur                                  |
| bvh           | INW-01 Bounding Volume Hierarchy                    |
| texturing     | INW-03 Solid and Noise Textures                     |
| lights        | INW-04 Lights, Camera and Action                    |
| iow-final     | the In-One-Weekend cover scene (BASELINE headline)  |
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.models.registry import register
from raytracing_tests_tpu.ops import apt as apt_mod
from raytracing_tests_tpu.ops import compute_basics
from raytracing_tests_tpu.ops.render import RenderConfig, extract_lights, render_jit
from raytracing_tests_tpu.scene import examples


def _rt_run(scene_fn, defaults: dict, lights: bool = False):
    """Shared driver for raytracing workloads."""

    def run(
        width: Optional[int] = None,
        height: Optional[int] = None,
        spp: Optional[int] = None,
        max_bounces: Optional[int] = None,
        show_normals: bool = False,
        intersector: Optional[str] = None,
        lane_chunk: Optional[int] = None,
        mesh=None,
        uber: bool = False,
        progressive: bool = False,
        tiles_per_step: int = 4,
        on_frame=None,
        **scene_kw,
    ):
        scene, camera = scene_fn(**scene_kw)
        cfg = RenderConfig(
            width=width or defaults.get("width", 128),
            height=height or defaults.get("height", 72),
            spp=spp or defaults.get("spp", 4),
            max_bounces=max_bounces or defaults.get("max_bounces", 5),
            show_normals=show_normals,
            intersector=intersector or defaults.get("intersector", "brute"),
            lane_chunk=lane_chunk,
            shading=defaults.get("shading", "bvh"),
        )
        cfg = cfg.for_scene(scene)
        lt = extract_lights(scene) if lights else None
        if progressive:
            # Reference base2's refine-from-center spiral (base2.h:329-381):
            # trace K tiles per step into a persistent canvas; ``on_frame``
            # sees every intermediate (CLI writes preview PNGs).
            from raytracing_tests_tpu.ops.tiles import render_progressive

            step = None
            for step in render_progressive(scene, camera, cfg, lt,
                                           tiles_per_step=tiles_per_step):
                if on_frame is not None:
                    on_frame(step)
            return dict(step, scene=scene, camera=camera, cfg=cfg)
        if uber and mesh is not None:
            from raytracing_tests_tpu.parallel.render_sharded import (
                render_uber_sharded)

            out = render_uber_sharded(scene, camera, cfg, mesh, lt)
        elif uber:
            from raytracing_tests_tpu.kernels.uber import render_uber

            out = render_uber(scene, camera, cfg, lt)
        elif mesh is not None:
            from raytracing_tests_tpu.parallel import render_sharded_jit

            out = render_sharded_jit(scene, camera, cfg, mesh, lt)
        else:
            out = render_jit(scene, camera, cfg, lt)
        return dict(out, scene=scene, camera=camera, cfg=cfg)

    return run


register(
    "sphere",
    "one sphere over a ground slab; camera with pitch/yaw + focus",
    reference="In-One-Weekend/01_Adding_Sphere",
)(_rt_run(examples.sphere_scene, dict(spp=1, max_bounces=2)))

register(
    "groups",
    "N-object cuboid/ellipsoid scene with per-object rotations and mirror bounces",
    reference="In-One-Weekend/02_Groups",
)(_rt_run(examples.groups_scene, dict(spp=4)))

register(
    "materials",
    "full Shirley materials: dielectric + metal + lambertian with DOF "
    "(IOW-03 shading: per-ray medium RI, Schlick shift, fibonacci scatter)",
    reference="In-One-Weekend/03_Shadows_and_Materials",
)(_rt_run(examples.materials_scene, dict(spp=16, max_bounces=5, shading="materials")))

register(
    "motion-blur",
    "objects swept between two checkpoints, per-sample time lerp",
    reference="In-Next-Week/00_MotionBlur",
)(_rt_run(examples.motion_blur_scene, dict(spp=16, max_bounces=5)))

register(
    "bvh",
    "grid of primitives under the grouped block-culling sweep (the "
    "flagship kernel's role); pass --intersector bvh for the LBVH "
    "traversal oracle (measured 827x slower at 1k objects on v5e — "
    "lockstep while_loop, docs/PERFORMANCE.md)",
    reference="In-Next-Week/01_BoundingVolumeHierarchy",
)(_rt_run(examples.bvh_grid_scene, dict(spp=4, intersector="pallas")))

register(
    "texturing",
    "cube-sphere textured objects: checker, simplex-noise and gradient atlases",
    reference="In-Next-Week/03_Solid_And_Noise_Textures",
)(_rt_run(examples.texturing_scene, dict(spp=4)))

register(
    "texturing-image",
    "image textures: procedural mercator planet (reprojected to cube atlas) + dice atlas",
    reference="In-Next-Week/03 texturing.cpp:41 + utility.cpp:253-487",
)(_rt_run(examples.texturing_image_scene, dict(spp=4)))

register(
    "lights",
    "emissive Cornell-style scene with AABB-targeted shadow rays",
    reference="In-Next-Week/04_Lights_Camera_And_Action",
)(_rt_run(examples.lights_scene, dict(spp=8, max_bounces=4), lights=True))

register(
    "iow-final",
    "the Ray Tracing in One Weekend cover scene (~480 spheres) — benchmark headline",
    reference="BASELINE.json configs[0]",
)(_rt_run(examples.iow_final_scene, dict(width=400, height=225, spp=16, max_bounces=8)))


@register(
    "uv-image",
    "hello-image UV gradient (minimal compute->image pipeline)",
    category="compute",
    reference="Compute-Shader/00_Basic-Compute-shader",
)
def _uv_image(width: int = 256, height: int = 256, **_):
    return {"image": compute_basics.uv_gradient(width, height)}


@register(
    "blur",
    "iterative ping-pong box blur of the UV gradient",
    category="compute",
    reference="Compute-Shader/01_Blur-Pictures",
)
def _blur(width: int = 256, height: int = 256, radius: int = 2, iterations: int = 4, **_):
    img = compute_basics.uv_gradient(width, height)
    return {"image": compute_basics.box_blur(img, radius=radius, iterations=iterations)}


@register(
    "buffer",
    "structured-buffer round trip (the SSBO demo)",
    category="compute",
    reference="Compute-Shader/03_Buffer-Supply-Compute-shader",
)
def _buffer(n: int = 256, **_):
    buf = jnp.arange(n, dtype=jnp.float32) / n
    out = compute_basics.buffer_transform(buf, scale=2.0, offset=0.5)
    return {"buffer": out, "image": jnp.tile(out[None, :, None], (16, 1, 3))}


@register(
    "evolve",
    "genetic-programming picture evolution (APT expression trees)",
    category="compute",
    reference="Compute-Shader/02_Evolving_Pics",
)
def _evolve(
    width: int = 128,
    height: int = 128,
    grid: int = 2,
    generations: int = 2,
    seed: int = 0,
    pick: int = 0,
    **_,
):
    ep = apt_mod.EvolvingPictures(grid=grid, seed=seed)
    for _gen in range(generations):
        ep.pick(pick)
    imgs = ep.render_grid(width, height)
    norm = jnp.concatenate(
        [
            jnp.concatenate(
                [apt_mod.normalize_image(imgs[r * grid + c]) for c in range(grid)],
                axis=1,
            )
            for r in range(grid)
        ],
        axis=0,
    )
    return {"image": norm, "pictures": imgs, "generation": ep.generation}
