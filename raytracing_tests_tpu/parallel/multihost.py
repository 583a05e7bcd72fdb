"""Multi-host pod entry + scaling-efficiency harness.

The reference is strictly single-process (SURVEY.md §2.6: no NCCL/MPI/Gloo);
this module is the TPU-native replacement: ``jax.distributed`` process
bootstrap so ``jax.devices()`` spans every host in the slice, and a
rays/s scaling harness measured at 1 chip / N chips (the BASELINE.json
">= 85% multi-host scaling efficiency" metric).

On a pod each host runs the same program; collectives ride ICI within the
slice.  Rendering shards rows over the GLOBAL device list (scene replicated),
and each host computes the full image rows it owns; ``process_index == 0``
assembles output.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax

from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.parallel.mesh import make_mesh
from raytracing_tests_tpu.parallel.render_sharded import render_sharded_jit


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Bring up jax.distributed (no-op if already initialized or single
    process). Returns this host's process index."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment
    return jax.process_index()


def measure_rays_per_s(scene, camera, cfg: RenderConfig, n_devices: int,
                       iters: int = 3, renderer: str = "queue"):
    """Wall-clock rays/s of the row-sharded renderer on an n-device mesh.

    Numerator = the renderer's own traced-ray counter (primary + secondary
    rays actually processed), the same honest count ``render_stats`` and
    ``bench.py`` use — so absolute numbers here are comparable to the
    headline benchmark, and the bounce tree being identical across mesh
    sizes keeps scaling ratios exact.

    ``renderer="uber"`` measures the flagship persistent megakernel via
    ``render_uber_sharded`` (sphere-mode scenes) instead of the general
    queue renderer.
    """
    mesh = make_mesh(n_devices)
    if renderer == "uber":
        from raytracing_tests_tpu.parallel.render_sharded import (
            render_uber_sharded)

        fn = lambda: render_uber_sharded(scene, camera, cfg, mesh)
    else:
        fn = lambda: render_sharded_jit(scene, camera, cfg, mesh)
    out = fn()
    jax.block_until_ready(out)
    rays = int(out["rays"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return rays / dt


def scaling_report(scene, camera, cfg: RenderConfig, device_counts: Sequence[int],
                   renderer: str = "queue"):
    """Scaling table: rays/s and efficiency vs linear from the 1st entry.

    Returns a list of dict(devices, rays_per_s, speedup, efficiency).
    """
    rows = []
    base = None
    for n in device_counts:
        rps = measure_rays_per_s(scene, camera, cfg, n, renderer=renderer)
        if base is None:
            base = (n, rps)
        speedup = rps / base[1]
        ideal = n / base[0]
        rows.append(
            {
                "devices": n,
                "rays_per_s": rps,
                "speedup": speedup,
                "efficiency": speedup / ideal,
            }
        )
    return rows
