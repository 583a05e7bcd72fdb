"""Live-parameter re-render loop — the reference's hot-reload analogue.

The reference's debugging loop is "edit shader source / drag an ImGui knob,
press reload, look at the new frame, keep the old program if the new one
fails" (``In-One-Weekend/base.h:27-57, 99-113``).  Headless TPU equivalent:
``watch`` polls a JSON params file and re-renders the workload whenever the
file changes, writing the frame to a PNG.  A params file that fails to
parse, fails to apply, or renders non-finite keeps the LAST GOOD frame on
disk (the keep-old-program semantics, via the same finite-check discipline
as ``utils.resilience.KeepLastGood``).

Params file schema (all keys optional)::

    {
      "width": 160, "height": 90, "spp": 4, "max_bounces": 6,
      "camera": {"position": [0,1,3], "direction": [0,-0.2,-1],
                 "fov_y_deg": 60, "aperture": 0.1, "focus_dist": 3.0},
      "scene": {"color":    [[2, [0.9, 0.1, 0.1]]],
                "position": [[2, [0.0, 1.0, -3.0]]]}
    }

``scene`` maps a Scene array field to ``[row, value]`` overrides —
the ImGui per-object drag widgets (``DrawVec3Control``) as data.
Config keys (width/spp/...) retrace on change, exactly like the
reference's local_size source patching + recompile.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from raytracing_tests_tpu.utils.logging import get_logger


def load_params(path: str) -> dict:
    with open(path) as f:
        params = json.load(f)
    assert isinstance(params, dict), f"{path}: expected a JSON object"
    return params


def apply_params(scene, camera, cfg, params: dict):
    """Apply a params dict to (scene, camera, cfg); returns new copies."""
    import dataclasses

    from raytracing_tests_tpu.scene.types import Camera

    cfg_keys = {k: params[k] for k in
                ("width", "height", "spp", "max_bounces") if k in params}
    if cfg_keys:
        cfg = dataclasses.replace(cfg, **cfg_keys)
    if "camera" in params:
        c = dict(params["camera"])
        camera = Camera.make(
            tuple(c.get("position", np.asarray(camera.position).tolist())),
            tuple(c.get("direction", np.asarray(camera.direction).tolist())),
            fov_y_deg=float(c.get(
                "fov_y_deg", np.degrees(float(camera.fov_y)))),
            aperture=float(c.get("aperture", camera.aperture)),
            focus_dist=c.get("focus_dist",
                             np.asarray(camera.focus_dist).tolist()),
            ortho_height=float(c.get("ortho_height", camera.ortho_height)),
        )
    for field, rows in params.get("scene", {}).items():
        arr = np.array(getattr(scene, field))  # copy; keeps dtype/shape
        for row, value in rows:
            arr[int(row)] = np.asarray(value, arr.dtype)
        scene = scene.replace(**{field: arr})
    return scene, camera, cfg


def watch(
    workload: str,
    params_path: str,
    out: str = "watch.png",
    interval_s: float = 0.5,
    max_renders: Optional[int] = None,
    run_kw: Optional[dict] = None,
):
    """Poll ``params_path``; re-render ``workload`` on each change.

    ``max_renders`` bounds the loop for scripted use (None = run until
    interrupted): the loop exits after that many PROCESSED params-file
    changes — rejected params count, so a persistently-broken file cannot
    hang a scripted caller.  Returns the number of successful renders.
    """
    from raytracing_tests_tpu.models import get_workload
    from raytracing_tests_tpu.ops.render import render_jit, extract_lights
    from raytracing_tests_tpu.utils import io

    log = get_logger()
    w = get_workload(workload)
    base = w.run(**(run_kw or {}))
    scene0, camera0, cfg0 = base["scene"], base["camera"], base["cfg"]
    has_lights = base.get("lights") is not None or bool(
        np.asarray(scene0.emissive).any())

    renders = 0
    changes = 0
    last_mtime = object()  # sentinel: the FIRST poll always processes,
    while max_renders is None or changes < max_renders:  # even if the
        try:                                             # file is missing
            mtime = os.stat(params_path).st_mtime_ns
        except FileNotFoundError:
            mtime = None
        if mtime == last_mtime:
            time.sleep(interval_s)
            continue
        last_mtime = mtime
        changes += 1
        try:
            params = load_params(params_path) if mtime is not None else {}
            scene, camera, cfg = apply_params(scene0, camera0, cfg0, params)
            cfg = cfg.for_scene(scene)
            lt = extract_lights(scene) if has_lights else None
            img = np.asarray(render_jit(scene, camera, cfg, lt)["image"])
            if not np.isfinite(img).all():
                raise FloatingPointError("render produced non-finite pixels")
            io.save_png(out, img)
            renders += 1
            log.info("watch: rendered %s -> %s (%d)", workload, out, renders)
        except Exception as e:  # keep the last good frame on disk
            log.warning("watch: params rejected, keeping last good frame: "
                        "%s: %s", type(e).__name__, e)
    return renders
