"""ctypes loader for the native host runtime (``src/rt_native.cpp``).

Compiles on first use with g++ — the premake/VS2019 build of the reference
(``premake5.lua``) collapses to one compiler invocation here.  The built
artifact is named by a hash of the source (``librt_native-<sha>.so``), so a
source edit always triggers a rebuild and a stale or foreign binary can never
be silently loaded (binaries are gitignored, never committed).  Everything
degrades gracefully: if no compiler is available, ``AVAILABLE`` is False and
callers fall back to the jax paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "rt_native.cpp")

AVAILABLE = False
_lib = None


def _lib_path() -> str:
    """Artifact path keyed by source hash: rebuilds on any source change and
    never trusts an existing binary built from different source."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"librt_native-{digest}.so")


def _build() -> str | None:
    try:
        lib = _lib_path()
        if os.path.exists(lib):
            return lib
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", _SRC, "-o", lib + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(lib + ".tmp", lib)  # atomic: concurrent builders race safely
        return lib
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    lib_path = _build()
    if lib_path is None:
        return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.rt_version.restype = ctypes.c_int
    if lib.rt_version() != 1:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rt_build_lbvh.argtypes = [
        f32p, f32p, ctypes.c_int, i32p, i32p, i32p, i32p, f32p, f32p,
    ]
    lib.rt_build_lbvh.restype = None
    lib.rt_noise_texture.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.rt_noise_texture.restype = None
    _lib = lib
    AVAILABLE = True
    return lib


def build_lbvh_host(bb_min: np.ndarray, bb_max: np.ndarray):
    """Native Karras LBVH build over (N, 3) AABB arrays.

    Returns dict(left, right, parent, obj_id, bb_min, bb_max) with the same
    node layout as ``bvh.build.build_lbvh``.  Raises RuntimeError when the
    native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    bb_min = np.ascontiguousarray(bb_min, np.float32)
    bb_max = np.ascontiguousarray(bb_max, np.float32)
    n = bb_min.shape[0]
    total = 2 * n - 1
    left = np.empty(total, np.int32)
    right = np.empty(total, np.int32)
    parent = np.empty(total, np.int32)
    obj_id = np.empty(total, np.int32)
    node_lo = np.empty((total, 3), np.float32)
    node_hi = np.empty((total, 3), np.float32)
    lib.rt_build_lbvh(bb_min, bb_max, n, left, right, parent, obj_id, node_lo, node_hi)
    return dict(
        left=left, right=right, parent=parent, obj_id=obj_id,
        bb_min=node_lo, bb_max=node_hi,
    )


NOISE_KINDS = {"simplex": 0, "fbm": 1, "turbulence": 2}


def noise_texture_host(
    height: int, width: int, scale: float = 8.0, octaves: int = 5, kind: str = "fbm"
) -> np.ndarray:
    """Threaded native noise baking -> (H, W) floats in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    out = np.empty((height, width), np.float32)
    lib.rt_noise_texture(height, width, float(scale), int(octaves), NOISE_KINDS[kind], out)
    return out


def available() -> bool:
    return _load() is not None
