"""In-kernel cube-sphere texturing: atlas sampling as one-hot MXU matmuls.

The reference's flagship kernels sample a texture array directly inside the
compute shader (``03_Texturing/computeShaderSrc.glsl:9-10`` sampler array;
cube-sphere UV + atlas lookup ``:386-409``).  TPUs have no per-lane gather,
so the TPU-native shape of a texture unit is a FACTORED ONE-HOT GATHER on
the MXU:

  - The (T, H, 6W, 3) atlas stack lives VMEM-resident as three per-channel
    (T*H, 6W) matrices, each decomposed into exact bf16 hi/mid/lo splits
    (``sweep2.pack_ftab_splits`` — texels reconstruct to full f32 mantissa;
    the one-hot operand is exactly bf16-representable).
  - A bilinear fetch folds the x-weights into ONE weighted one-hot
    operand: ``A_c (TH, 6W) @ [(1-wx)·onehot(x0) + wx·onehot(x1)] -> (TH,
    L)`` on the MXU, then reduces rows with a y-weighted iota mask on the
    VPU — 2 matmuls + 1 masked reduction per channel
    (``scene/textures.py:68-92`` bilinear semantics; see
    ``sample_atlas_k`` for the exactness budget).

The whole sampler is gated on ``any(lane needs texture)`` so untextured
blocks pay two compares; scenes without textures skip it statically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raytracing_tests_tpu.kernels.sweep2 import pack_ftab_splits

TEX_LANE = 128  # column padding (f32 lane tile)
TEX_SUB = 16  # row padding (bf16 sublane tile)


def pack_atlas(textures):
    """(T, H, 6W, 3) f32 atlas stack -> (ttab3, meta).

    ``ttab3`` = (hi, mid, lo) bf16 arrays of shape (3*THp, W6p): channel c's
    rows are [c*THp, c*THp + T*H).  ``meta`` = (T, H, W6, THp, W6p) static
    ints baked into the kernel."""
    T, H, W6, C = textures.shape
    assert C == 3, textures.shape
    TH = T * H
    THp = -(-TH // TEX_SUB) * TEX_SUB
    W6p = -(-W6 // TEX_LANE) * TEX_LANE
    a = jnp.transpose(jnp.reshape(textures, (TH, W6, 3)), (2, 0, 1))
    a = jnp.pad(a, ((0, 0), (0, THp - TH), (0, W6p - W6)))
    a = jnp.reshape(a, (3 * THp, W6p))
    return pack_ftab_splits(a), (T, H, W6, THp, W6p)


def _cube_sphere_uv_k(lx, ly, lz):
    """``scene.textures.cube_sphere_uv`` on (1, L) planes: local unit-space
    position -> (face i32, u, v).  Reference scan order: +-x start, y then z
    win strict-greater comparisons (glsl:387-407)."""
    ax, ay, az = jnp.abs(lx), jnp.abs(ly), jnp.abs(lz)
    face = jnp.where(lx > 0, 1, 3)
    dom = ax
    face = jnp.where(ay > dom, jnp.where(ly > 0, 0, 5), face)
    dom = jnp.maximum(dom, ay)
    face = jnp.where(az > dom, jnp.where(lz > 0, 2, 4), face)

    fdx = jnp.where(face == 1, 1.0, 0.0) - jnp.where(face == 3, 1.0, 0.0)
    fdy = jnp.where(face == 0, 1.0, 0.0) - jnp.where(face == 5, 1.0, 0.0)
    fdz = jnp.where(face == 2, 1.0, 0.0) - jnp.where(face == 4, 1.0, 0.0)
    denom = lx * fdx + ly * fdy + lz * fdz
    dsafe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    px = (lx / dsafe) * 0.5 + 0.5
    py = (ly / dsafe) * 0.5 + 0.5
    pz = (lz / dsafe) * 0.5 + 0.5

    # Per-face texcoord table (glsl switch): u = [px, 1-py, px, pz, 1-py, pz]
    # v = [1-pz, 1-pz, py, py, 1-px, 1-px], face-indexed.
    u = px
    u = jnp.where((face == 1) | (face == 4), 1.0 - py, u)
    u = jnp.where((face == 3) | (face == 5), pz, u)
    v = 1.0 - pz
    v = jnp.where((face == 2) | (face == 3), py, v)
    v = jnp.where((face == 4) | (face == 5), 1.0 - px, v)
    return face, u, v


def sample_atlas_k(thi_ref, tmid_ref, tlo_ref, ti, lx, ly, lz, *, T, H, W6,
                   THp, W6p, exact=False):
    """Bilinear cube-sphere atlas sample on (1, L) planes.

    ``ti``: (1, L) f32 texture index (1-based; 0 rows are masked by the
    caller).  ``(lx, ly, lz)``: local unit-space hit position.  Returns
    (tr, tg, tb) each (1, L) f32 — ``scene.textures.sample_atlas``'s
    bilinear.

    The bilinear WEIGHTS are folded into the gather operands (one weighted
    x-column operand on the MXU side, one weighted y-row mask on the VPU
    side), so the whole fetch is 2-3 matmuls + 1 masked reduction per
    channel instead of the 4-corner form's 12-18 + 12 (measured ~2x the
    whole texturing frame).  At a clamp edge (x0 == x1 / y0 == y1) the two
    folded weights land on the same slot and SUM to 1 — still exact.
    Accuracy: x-weights ride the bf16 one-hot (~4e-3 relative WEIGHT
    error, bounded by the neighbor-texel difference); y-weights are f32
    exact; texels reconstruct to 16 mantissa bits (~8e-6) from the hi+mid
    splits, or full f32 with ``exact=True`` (adds the lo matmul)."""
    L = ti.shape[1]
    face, u, v = _cube_sphere_uv_k(lx, ly, lz)

    au = (face.astype(jnp.float32) + jnp.clip(u, 0.0, 1.0)) * (1.0 / 6.0)
    av = jnp.clip(v, 0.0, 1.0)
    fx = au * W6 - 0.5
    fy = av * H - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W6 - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W6 - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = jnp.clip(fx - x0.astype(jnp.float32), 0.0, 1.0)
    wy = jnp.clip(fy - y0.astype(jnp.float32), 0.0, 1.0)

    tii = jnp.clip(ti.astype(jnp.int32), 0, T - 1)
    row0 = tii * H + y0
    row1 = tii * H + y1

    xio = jax.lax.broadcasted_iota(jnp.int32, (W6p, L), 0)
    ohw = (jnp.where(xio == x0, 1.0 - wx, 0.0)
           + jnp.where(xio == x1, wx, 0.0)).astype(jnp.bfloat16)
    rio = jax.lax.broadcasted_iota(jnp.int32, (THp, L), 0)
    mw = (jnp.where(rio == row0, 1.0 - wy, 0.0)
          + jnp.where(rio == row1, wy, 0.0))
    dn = (((1,), (0,)), ((), ()))
    refs = (thi_ref, tmid_ref, tlo_ref) if exact else (thi_ref, tmid_ref)

    out = []
    for c in range(3):
        sl = slice(c * THp, (c + 1) * THp)
        g = None
        for ref in refs:
            p = jax.lax.dot_general(ref[sl], ohw, dn,
                                    preferred_element_type=jnp.float32)
            g = p if g is None else g + p
        out.append(jnp.sum(mw * g, axis=0, keepdims=True))
    return out[0], out[1], out[2]
