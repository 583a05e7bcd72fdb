"""Deterministic sample-distribution functions.

The reference is a *deterministic* renderer: every "random" direction is a
fixed function of the sample index (sunflower / fibonacci lattices), which is
what makes bit-parity testing possible.  These mirror:

  - ``SunflowerDistribution``  (``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:15-28``)
  - ``deviateWithLinmit90deg`` (same file, :29-46)
  - ``sunflower_distr`` / ``fibonacciHemiSpherePtDirn``
    (``03_Shadows_and_Materials/computeShaderSrc.glsl:153-184``)

All take integer sample indices (arrays) and broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracing_tests_tpu.core import linalg

PI = 3.1415926538
GOLDEN_ANGLE = PI * (3.0 - jnp.sqrt(5.0))  # 'PHI' in the reference kernels


def sunflower_disc(sample_index, max_samples, aperture):
    """Point in a disc of diameter ``aperture`` on a sunflower (Vogel) lattice.

    ``sample_index == 0`` maps to the center.  The outermost ``b ~ 2*sqrt(n)``
    samples are pinned to the rim (boundary smoothing), as in the reference.
    """
    i = jnp.asarray(sample_index, jnp.float32)
    n = jnp.asarray(max_samples, jnp.float32)
    b = jnp.round(2.0 * jnp.sqrt(n))
    half_ap = jnp.asarray(aperture) * 0.5
    # Guard: for tiny n the denominator n - (b+1)/2 hits 0 (all samples are on
    # the rim and the interior branch is masked out, but its gradient isn't).
    denom = n - (b + 1.0) / 2.0
    denom = jnp.where(denom > 0.0, denom, 1.0)
    r = jnp.where(
        i > n - b,
        half_ap,
        half_ap * jnp.sqrt(jnp.maximum(i - 0.5, 0.0) / denom),
    )
    theta = GOLDEN_ANGLE * i
    pt = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where((i == 0)[..., None], jnp.zeros_like(pt), pt)


def sunflower_unit_disc(sample_index, max_samples):
    """Unit-disc sunflower lattice with the materials-kernel angle convention
    (``theta = 2*pi*i/phi^2``)."""
    i = jnp.asarray(sample_index, jnp.float32)
    n = jnp.asarray(max_samples, jnp.float32)
    b = jnp.round(2.0 * jnp.sqrt(n))
    golden = (jnp.sqrt(5.0) + 1.0) / 2.0
    denom = n - (b + 1.0) / 2.0
    denom = jnp.where(denom > 0.0, denom, 1.0)
    r = jnp.where(i > n - b, 1.0, jnp.sqrt(jnp.maximum(i - 0.5, 0.0) / denom))
    theta = 2.0 * PI * i / (golden * golden)
    pt = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return jnp.where((i == 0)[..., None], jnp.zeros_like(pt), pt)


def deviate_within_cone(direction, sample_index, max_samples, tan_theta):
    """Deterministically scatter ``direction`` within a cone of ``tan_theta``.

    Mirrors ``deviateWithLinmit90deg``: a sunflower offset (diameter
    ``2*tan_theta``) in the plane spanned by ``cross(d, up)`` and
    ``cross(right, d)``, scaled by the reference's fixed 0.1 factor.
    """
    off = sunflower_disc(sample_index, max_samples, 2.0 * jnp.asarray(tan_theta))
    up = jnp.array([0.0, 1.0, 0.0], direction.dtype)
    right = linalg.cross(direction, jnp.broadcast_to(up, direction.shape))
    up2 = linalg.cross(right, direction)
    factor = 0.1
    return linalg.normalize(
        direction + factor * (off[..., 0:1] * right + off[..., 1:2] * up2)
    )


def fibonacci_hemisphere(sample_index, max_samples, scatteritivity, focus_dirn):
    """Deterministic scatter around ``focus_dirn`` on a scaled fibonacci sphere.

    Mirrors ``fibonacciHemiSpherePtDirn``: points on a fibonacci sphere of
    radius ``scatteritivity`` centered at the tip of ``focus_dirn``.
    """
    i = jnp.asarray(sample_index, jnp.float32)
    n = jnp.asarray(max_samples, jnp.float32)
    y = 1.0 - i / jnp.maximum(n - 1.0, 1.0)  # n=1: the single sample is the pole
    radius = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    theta = GOLDEN_ANGLE * i
    x = jnp.cos(theta) * radius
    z = jnp.sin(theta) * radius
    s = jnp.asarray(scatteritivity)
    x, y, z = x * s, y * s, z * s

    y_cap = focus_dirn
    world_up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], focus_dirn.dtype), focus_dirn.shape)
    z_cap = linalg.normalize(linalg.cross(world_up, y_cap), eps=1e-20)
    x_cap = linalg.normalize(linalg.cross(y_cap, z_cap), eps=1e-20)
    pt = focus_dirn + (
        x[..., None] * x_cap + y[..., None] * y_cap + z[..., None] * z_cap
    )
    return linalg.normalize(pt)


def supersample_grid_offsets(num_samples):
    """The reference's diagonal-scan supersampling grid
    (``03_Shadows_and_Materials/computeShaderSrc.glsl:385-399``): for n samples,
    pick grid = ceil(sqrt(n)) and walk cells (1,1),(1,0),(0,1),(2,2),(2,1),...

    Returns integer offsets of shape (num_samples, 2); host-side helper
    (static, so plain Python).
    """
    grid = 1
    while grid * grid < num_samples:
        grid += 1
    out = []
    focus = x = y = 0
    sx = sy = 0
    for _ in range(num_samples):
        if focus < grid:
            if x == 0 and y == 0:
                focus += 1
                x = y = focus
                sx, sy = focus, focus
            else:
                if x < y:
                    y -= 1
                    sx, sy = focus, y
                else:
                    x -= 1
                    sx, sy = x, focus
        out.append((sx, sy))
    import numpy as np

    return np.asarray(out, dtype=np.int32), grid
