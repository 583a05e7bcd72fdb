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


def shard_iteration_counts(scene, camera, cfg: RenderConfig, n_shards: int,
                           L: int = 2048, R: int = 32, gr: int = 64):
    """DETERMINISTIC per-shard work for the interleaved row sharding: each
    shard's persistent-kernel while-loop iteration count (the kernel's own
    stat counter), computed by running every shard's exact program
    sequentially on whatever backend this runs on.

    Iteration counts are invariant to clock/tunnel weather (PERFORMANCE.md
    fact 37: "iteration counts are deterministic and always comparable"),
    so this is the honest load-balance model this single-chip environment
    CAN measure for the multi-chip claim: with every shard running the same
    kernel at the same per-iteration cost, wall-clock on a real mesh is set
    by the SLOWEST shard — efficiency <= mean(iters) / max(iters).

    Returns a list of per-shard iteration counts (length ``n_shards``)."""
    import dataclasses

    import jax.numpy as jnp

    from raytracing_tests_tpu.kernels.uber import (
        _uber_call, make_accel2, pack_camera)

    assert cfg.shading == "bvh" and cfg.pallas_mode in ("spheres", "generic")
    gr = min(gr, max(8, -(-scene.capacity // 8) * 8))
    H, W, S = cfg.height, cfg.width, cfg.spp
    h = -(-H // n_shards)
    shard_cfg = dataclasses.replace(cfg, height=h)
    B_shard = h * W * S
    if cfg.pallas_mode == "spheres":
        accel = make_accel2(scene, gr=gr, has_motion=cfg.has_motion,
                            sort_origin=camera.position,
                            probe_rows=cfg.probe_rows)
    else:
        from raytracing_tests_tpu.kernels.sweep2g import make_accel2g

        accel = make_accel2g(scene, gr=gr, has_motion=cfg.has_motion,
                             sort_origin=camera.position,
                             probe_rows=cfg.probe_rows)
    iters = []
    for d in range(n_shards):
        cam = pack_camera(camera, row_stride=float(n_shards),
                          row0=float(d))
        _, stat, NB = _uber_call(
            accel.otab, accel.ftab3, accel.gaabb, cam, shard_cfg,
            B_shard, L, R, gr, False, full_height=H,
            n_sgroups=getattr(accel, "n_sgroups", 0),
            gkinds=getattr(accel, "gkinds", None))
        iters.append(int(jnp.sum(stat[2].reshape(NB, L)[:, 0])))
    return iters


def load_imbalance_report(scene, camera, cfg: RenderConfig,
                          shard_counts: Sequence[int] = (1, 2, 4, 8),
                          L: int = 2048, R: int = 32, gr: int = 64):
    """Deterministic scaling model over ``shard_counts``: per-shard
    iteration counts, worst/mean imbalance, and the implied efficiency
    bound (see ``shard_iteration_counts``).  The interleaved row map
    exists exactly to keep this ratio near 1 (sky rows and deep-BVH rows
    alternate across shards — SURVEY.md §7 hard-part 5)."""
    rows = []
    for n in shard_counts:
        its = shard_iteration_counts(scene, camera, cfg, n, L=L, R=R, gr=gr)
        mean = sum(its) / len(its)
        worst = max(its)
        rows.append({
            "shards": n,
            "iters": its,
            "imbalance": worst / mean,
            "efficiency_bound": mean / worst,
        })
    return rows


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
