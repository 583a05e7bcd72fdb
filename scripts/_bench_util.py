"""Shared timing helper for the on-chip tuning scripts."""
import time

import jax
import numpy as np


def run(tag, fn, n=3):
    """Compile+warm ``fn`` (a thunk returning a render output dict), then
    time ``n`` frames; prints Mrays/s from the honest traced-ray counter
    and the dropped-ray count."""
    out = fn()
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    drop = int(out.get("rays_dropped", 0))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out["image"])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt:.3f}s rays={rays} drop={drop} "
          f"mean={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)
    return rays / dt
