"""The small compute workloads (Compute-Shader/00, 01, 03 + IOW-00).

These mirror the reference's warm-up tests that exercise the compute
pipeline before raytracing:

  - ``uv_gradient``   CS-00's embedded kernel: writes a UV-coordinate color
                      gradient per pixel (``basic_compute_shader.cpp:8-29``)
                      and IOW-00's default kernel (``In-One-Weekend/
                      base.cpp:7-28``).
  - ``box_blur``      CS-01: iterative ping-pong box blur with an
                      area-of-influence radius (``blur_via_compute_shader.cpp``,
                      embedded kernel :103-118).
  - ``buffer_transform`` CS-03: an SSBO-fed kernel (std430 block,
                      ``03_Buffer.../test.cpp:5-31``) — here simply a jitted
                      elementwise transform of a structured input buffer,
                      which is what the SSBO demo computes.

All are jit-compatible pure functions on (H, W, C) arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def uv_gradient(width: int, height: int):
    """(H, W, 3) image with R = u, G = v, B = 0.25 (CS-00 kernel)."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    r = jnp.broadcast_to(u[None, :], (height, width))
    g = jnp.broadcast_to(v[:, None], (height, width))
    b = jnp.full((height, width), 0.25, jnp.float32)
    return jnp.stack([r, g, b], axis=-1)


@partial(jax.jit, static_argnames=("radius", "iterations"))
def box_blur(image, radius: int = 1, iterations: int = 1):
    """Iterative box blur of an (H, W, C) image.

    The reference ping-pongs between two image bindings, one dispatch per
    iteration, averaging the (2r+1)^2 neighborhood with edge clamping
    (``blur_via_compute_shader.cpp:103-118``); ``lax.scan`` plays the role of
    the ping-pong (XLA double-buffers the carry) and a separable two-pass sum
    replaces the naive window loop.
    """
    k = 2 * radius + 1
    H, W = image.shape[:2]

    def one_pass(img, _):
        # Exact reference semantics: mean over the edge-clamped square window
        # (sum of k^2 shifted views of the replicate-padded image).
        p = jnp.pad(img, ((radius, radius), (radius, radius), (0, 0)), mode="edge")
        acc = sum(p[dy : dy + H, dx : dx + W] for dy in range(k) for dx in range(k))
        return acc / (k * k), None

    out, _ = jax.lax.scan(one_pass, image, None, length=iterations)
    return out


@jax.jit
def buffer_transform(buffer, scale=2.0, offset=0.0):
    """CS-03's SSBO round trip: a structured array in, elementwise out."""
    return buffer * scale + offset
