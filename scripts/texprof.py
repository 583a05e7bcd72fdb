#!/usr/bin/env python
"""On-chip experiment: where does the texturing queue-render time go, and
does a flat 1-D-plane atlas gather beat the 4-D advanced-indexing gather?

Variants:
  base      current sample_atlas (textures[ti, y0, x0] 4-D indexing x4 taps)
  notex     same scene with textures stripped (lower bound / non-gather cost)
  flat      taps as row gathers from a flattened (T*H*W6, 3) table
  planes    taps as 12 pure 1-D gathers from per-channel planes
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _bench_util import run

from raytracing_tests_tpu.ops.render import RenderConfig, render_stats
from raytracing_tests_tpu.scene import examples, textures as tex


def _prep(fx, fy, W6, H):
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W6 - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W6 - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    return x0, y0, x1, y1, wx, wy


def sample_atlas_flat(textures, tex_index, face, u, v):
    T, H, W6, _ = textures.shape
    au = (face.astype(jnp.float32) + jnp.clip(u, 0.0, 1.0)) / 6.0
    av = jnp.clip(v, 0.0, 1.0)
    x0, y0, x1, y1, wx, wy = _prep(au * W6 - 0.5, av * H - 0.5, W6, H)
    ti = jnp.clip(tex_index, 0, T - 1)
    flat = textures.reshape(T * H * W6, 3)
    base = ti * (H * W6)
    r0 = base + y0 * W6
    r1 = base + y1 * W6
    c00 = flat[r0 + x0]
    c01 = flat[r0 + x1]
    c10 = flat[r1 + x0]
    c11 = flat[r1 + x1]
    return (c00 * (1 - wx) + c01 * wx) * (1 - wy) + (
        c10 * (1 - wx) + c11 * wx) * wy


def sample_atlas_planes(textures, tex_index, face, u, v):
    T, H, W6, _ = textures.shape
    au = (face.astype(jnp.float32) + jnp.clip(u, 0.0, 1.0)) / 6.0
    av = jnp.clip(v, 0.0, 1.0)
    x0, y0, x1, y1, wx, wy = _prep(au * W6 - 0.5, av * H - 0.5, W6, H)
    wx, wy = wx[..., 0], wy[..., 0]
    ti = jnp.clip(tex_index, 0, T - 1)
    base = ti * (H * W6)
    i00 = base + y0 * W6 + x0
    i01 = base + y0 * W6 + x1
    i10 = base + y1 * W6 + x0
    i11 = base + y1 * W6 + x1
    chans = []
    for c in range(3):
        p = textures[..., c].reshape(-1)
        v00, v01, v10, v11 = p[i00], p[i01], p[i10], p[i11]
        chans.append((v00 * (1 - wx) + v01 * wx) * (1 - wy)
                     + (v10 * (1 - wx) + v11 * wx) * wy)
    return jnp.stack(chans, axis=-1)


def main():
    print("device:", jax.devices()[0], flush=True)
    s, c = examples.texturing_scene()
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       intersector="pallas").for_scene(s)
    fq = jax.jit(lambda: render_stats(s, c, cfg, None))
    run("base ", lambda: fq(), n=3)

    import dataclasses
    s2 = dataclasses.replace(s, textures=None,
                             texture_index=jnp.zeros_like(s.texture_index))
    cfg2 = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                        intersector="pallas").for_scene(s2)
    f2 = jax.jit(lambda: render_stats(s2, c, cfg2, None))
    run("notex", lambda: f2(), n=3)

    orig = tex.sample_atlas
    for name, fn in (("flat ", sample_atlas_flat),
                     ("plane", sample_atlas_planes)):
        tex.sample_atlas = fn
        f3 = jax.jit(lambda: render_stats(s, c, cfg, None))
        run(name, lambda f3=f3: f3(), n=3)
    tex.sample_atlas = orig


if __name__ == "__main__":
    main()
