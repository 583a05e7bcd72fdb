"""Mesh-sharded rendering: image rows over devices, scene replicated.

TPU-native replacement for the reference's single-GPU dispatch + spiral tile
scheduler (``RT_Base base.h:170``, ``materials.cpp:100-120``): primary rays
are generated for the whole image, rows are interleave-permuted for load
balance, and a ``shard_map`` traces each device's row block with the scene
SoA replicated per chip.  No collectives run in the forward pass; gradient
``psum`` over the ``rows`` axis falls out of the ``shard_map`` transpose in
``diff/``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 re-export
    from jax import shard_map as _shard_map_mod  # noqa: F401

    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from raytracing_tests_tpu.ops.camera_rays import primary_rays
from raytracing_tests_tpu.ops.render import (
    Lights,
    RenderConfig,
    _build_accel,
    finalize,
    trace_lanes,
)
from raytracing_tests_tpu.parallel.mesh import ROWS_AXIS, row_permutation
from raytracing_tests_tpu.scene.types import Camera, Scene


def render_sharded(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    lights: Optional[Lights] = None,
):
    """Full render sharded over ``mesh``'s ``rows`` axis.

    Returns dict(image=(H, W, 3), depth=(H, W)) exactly matching the
    single-device ``ops.render.render`` output (tested allclose).
    """
    H, W, S = cfg.height, cfg.width, cfg.spp
    n = mesh.shape[ROWS_AXIS]
    perm, inverse, padded = row_permutation(H, n)

    o, d, time_ratio = primary_rays(camera, W, H, S)
    sample_idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (H, W, S))

    def pad_rows(x):
        pad = padded - H
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x[perm]

    o, d, time_ratio, sample_idx = (pad_rows(x) for x in (o, d, time_ratio, sample_idx))
    accel = _build_accel(scene, cfg)  # built once, replicated per chip

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P()),
        check_vma=False,
    )
    def block(scene_, lights_, accel_, o_, d_, ratio_, sidx_):
        h = o_.shape[0]
        flat = lambda x: x.reshape((h * W * S,) + x.shape[3:])
        color, primary_t, rays, _ = trace_lanes(
            scene_, lights_, cfg, flat(o_), flat(d_), flat(ratio_), flat(sidx_), accel_
        )
        rays = jax.lax.psum(rays, ROWS_AXIS)  # global traced-ray count
        return color.reshape(h, W, S, 3), primary_t.reshape(h, W, S), rays

    colors, depths, rays = block(scene, lights, accel, o, d, time_ratio, sample_idx)
    colors = colors[inverse][:H]
    depths = depths[inverse][:H]
    out = finalize(colors, depths, cfg)
    # Zero-direction padding rows cost exactly one (missing) pop per lane.
    out["rays"] = rays - (padded - H) * W * S
    return out


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def render_sharded_jit(scene, camera, cfg: RenderConfig, mesh: Mesh, lights=None):
    return render_sharded(scene, camera, cfg, mesh, lights)


def render_uber_sharded(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    lights: Optional[Lights] = None,
    L: int = 2048,
    R: int = 32,
    gr: int = 64,
):
    """The persistent megakernel sharded over ``mesh``'s ``rows`` axis.

    Each device renders the INTERLEAVED row set ``{d, d+n, d+2n, ...}`` —
    the affine (stride, offset) row map rides the kernel's camera vector,
    so every device generates exactly the rays the single-device render
    would for its rows (bit-identical images, load-balanced rows).  The
    scene tables are replicated; no collectives in the forward pass except
    the traced-ray psum.  When ``H % n != 0`` the padded rows render
    off-frame sky rays (counted in ``rays``; discarded from the image).
    """
    import dataclasses

    from raytracing_tests_tpu.kernels.uber import (
        _camera_statics, _scene_accel, _uber_call, pack_camera, pack_lights)

    assert cfg.shading in ("bvh", "materials"), cfg.shading
    if cfg.shading == "materials":
        assert lights is None, "materials shading: no emissive lights"
    # Camera features ride the same static raygen switches as the
    # single-device render_uber, via the shared helper (a silent default
    # here would render a DIFFERENT image than the path it mirrors; see
    # _camera_statics for the traced-ortho limitation).
    n_focus, aa, is_ortho = _camera_statics(camera, cfg)
    lts, n_lights = pack_lights(lights)
    if scene.textures is not None:
        from raytracing_tests_tpu.kernels.texture import pack_atlas

        tex3, tex_meta = pack_atlas(scene.textures)
    else:
        tex3, tex_meta = None, None
    gr = min(gr, max(8, -(-scene.capacity // 8) * 8))
    H, W, S = cfg.height, cfg.width, cfg.spp
    n = mesh.shape[ROWS_AXIS]
    h = -(-H // n)
    Hp = h * n
    shard_cfg = dataclasses.replace(cfg, height=h)
    B_shard = h * W * S
    # Shared probe-cut + identity-cached accel build (fact 45; the
    # per-device camera is packed inside the shard_map instead).
    accel, _ = _scene_accel(scene, camera, cfg, gr)

    if lts is None:
        lts = jnp.zeros((1, 8), jnp.float32)
    tex_in = tex3 if tex3 is not None else ()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()) + (P(),) * len(tex_in),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(), P()),
        check_vma=False,
    )
    def block(accel_, camera_, lts_, *tex_):
        dev = jax.lax.axis_index(ROWS_AXIS)
        cam = pack_camera(camera_, row_stride=float(n),
                          row0=dev.astype(jnp.float32))
        out, stat, _ = _uber_call(
            accel_.otab, accel_.ftab3, accel_.gaabb, cam, shard_cfg,
            B_shard, L, R, gr, False, full_height=H, lts=lts_,
            n_lights=n_lights, tex3=tex_ or None, tex_meta=tex_meta,
            n_sgroups=getattr(accel_, "n_sgroups", 0),
            gkinds=getattr(accel_, "gkinds", None),
            n_focus=n_focus, aa=aa, is_ortho=is_ortho)
        NB = -(-B_shard // (R * L))
        o4 = out.reshape(4, R, NB, L).transpose(2, 1, 3, 0)
        o4 = o4.reshape(NB * R * L, 4)[:B_shard]
        colors = o4[:, :3].reshape(h, W, S, 3)
        pt = o4[:, 3].reshape(h, W, S)
        rays = jax.lax.psum(jnp.sum(stat[0]), ROWS_AXIS)
        dropped = jax.lax.psum(jnp.sum(stat[1]), ROWS_AXIS)
        return colors, pt, rays, dropped

    colors, depths, rays, dropped = block(accel, camera, lts, *tex_in)
    # device d's local row r is global row r*n + d: de-interleave.
    colors = colors.reshape(n, h, W, S, 3).swapaxes(0, 1).reshape(Hp, W, S, 3)[:H]
    depths = depths.reshape(n, h, W, S).swapaxes(0, 1).reshape(Hp, W, S)[:H]
    out = finalize(colors, depths, cfg)
    out["rays"] = rays
    out["rays_dropped"] = dropped
    return out
