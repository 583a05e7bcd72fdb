"""Mesh construction + load-balanced row assignment.

``make_mesh`` builds a 1-D ``jax.sharding.Mesh`` over all (or the first N)
devices with a single ``rows`` axis: path tracing is embarrassingly parallel
over pixels, so one data axis suffices; scene/BVH stay replicated (SURVEY.md
§2.6).  Multi-host pods reuse the same code — ``jax.devices()`` spans hosts
once ``jax.distributed.initialize`` has run (see ``parallel/multihost.py``).

``row_permutation`` is the load balancer: the reference walks tiles in a
spiral from the image center so expensive (geometry-dense) regions render
first (``base2.h:329-381``); on a mesh the equivalent is a *strided
interleave* so each device gets every n-th row, mixing cheap sky rows and
expensive geometry rows instead of giving one device the whole horizon.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

ROWS_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        assert n_devices <= len(devs), (n_devices, len(devs))
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (ROWS_AXIS,))


def row_permutation(height: int, n_shards: int):
    """(perm, inverse, padded_height): strided interleave of image rows.

    Rows are padded to a multiple of ``n_shards``; ``perm[k]`` is the source
    row of position k in the sharded layout, laid out so shard s holds rows
    ``s, s + n, s + 2n, ...`` — each shard sees a uniform slice of the image.
    """
    padded = -(-height // n_shards) * n_shards
    # position (s, i) <- row i * n_shards + s
    perm = np.arange(padded).reshape(-1, n_shards).T.reshape(-1)
    inverse = np.argsort(perm)
    return perm, inverse, padded
