"""Shared timing helper for the on-chip tuning scripts."""
import os
import time

import jax
import numpy as np

# Persistent compilation cache: tuning runs one variant per process (env
# ablation flags are read at trace time), so without this every process
# pays the full 50-250 s tunnel compile even for an already-seen kernel.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(tag, fn, n=3):
    """Compile+warm ``fn`` (a thunk returning a render output dict), then
    time ``n`` frames; prints Mrays/s from the honest traced-ray counter
    and the dropped-ray count."""
    out = fn()
    jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    drop = int(out.get("rays_dropped", 0))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out["image"])
        times.append(time.perf_counter() - t0)
    dt = min(times)  # the min frame is the renderer; the mean is weather
    print(f"{tag}: best={dt:.3f}s mean={sum(times)/n:.3f}s rays={rays} "
          f"drop={drop} img={float(np.asarray(out['image']).mean()):.4f} "
          f"-> {rays/dt/1e6:.1f} Mrays/s", flush=True)
    return rays / dt
