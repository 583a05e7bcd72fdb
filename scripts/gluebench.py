#!/usr/bin/env python
"""Micro-costs of the megaqueue driver's XLA glue ops at real sizes."""
import time
import jax
import jax.numpy as jnp
import numpy as np

C = 1 << 20


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    valid = jnp.asarray(rng.rand(2 * C) < 0.4)
    rows = jnp.asarray(rng.rand(16, 2 * C).astype(np.float32))
    lane = jnp.asarray(rng.randint(0, 3 * C, size=2 * C).astype(np.int32))
    iota2 = jax.lax.iota(jnp.int32, 2 * C)

    f = jax.jit(lambda v: jax.lax.sort(jnp.where(v, iota2, iota2 | (1 << 30))))
    print(f"sort 1xi32 2M:        {timeit(f, valid)*1e3:7.2f} ms", flush=True)

    f = jax.jit(lambda v, l: jax.lax.sort(
        [jnp.where(v, 0, 1).astype(jnp.int32), l], num_keys=1, is_stable=True))
    print(f"sort 2xi32 2M:        {timeit(f, valid, lane)*1e3:7.2f} ms", flush=True)

    f = jax.jit(lambda v, l, r: jax.lax.sort(
        [jnp.where(v, 0, 1).astype(jnp.int32), l] + [r[k] for k in range(16)],
        num_keys=1, is_stable=True))
    print(f"sort 18-op 2M:        {timeit(f, valid, lane, rows)*1e3:7.2f} ms", flush=True)

    src = jnp.asarray(rng.permutation(2 * C).astype(np.int32))
    f = jax.jit(lambda r, s: jnp.take(r, s, axis=1))
    print(f"take (16,2M) perm:    {timeit(f, rows, src)*1e3:7.2f} ms", flush=True)

    srt = jnp.sort(src)
    f = jax.jit(lambda r, s: jnp.take(r, s, axis=1))
    print(f"take (16,2M) sorted:  {timeit(f, rows, srt)*1e3:7.2f} ms", flush=True)

    tgt = jnp.zeros(3 * C + 1, jnp.float32)
    idx3 = jnp.asarray(rng.randint(0, 3 * C, size=3 * C).astype(np.int32))
    upd = jnp.asarray(rng.rand(3 * C).astype(np.float32))
    f = jax.jit(lambda t, i, u: t.at[i].add(u))
    print(f"scatter-add 3M:       {timeit(f, tgt, idx3, upd)*1e3:7.2f} ms", flush=True)

    f = jax.jit(lambda t, i, u: t.at[i].set(u))
    print(f"scatter-set 3M:       {timeit(f, tgt, idx3, upd)*1e3:7.2f} ms", flush=True)

    f = jax.jit(lambda v: jnp.cumsum(v.astype(jnp.int32)))
    print(f"cumsum 2M:            {timeit(f, valid)*1e3:7.2f} ms", flush=True)

    pool = jnp.zeros((16, 13 * C), jnp.float32)
    f = jax.jit(lambda p, r: jax.lax.dynamic_update_slice(p, r, (0, jnp.int32(C))))
    print(f"dyn_upd (16,2M):      {timeit(f, pool, rows)*1e3:7.2f} ms", flush=True)

    f = jax.jit(lambda p: jax.lax.dynamic_slice(p, (0, jnp.int32(C)), (16, C)))
    print(f"dyn_slice (16,1M):    {timeit(f, pool)*1e3:7.2f} ms", flush=True)

    # Dense per-lane queue ops at B=1M, Q=8 (the ops/render.py RayQueue shape).
    B, Q = 1 << 20, 8
    qsize = jnp.asarray(rng.randint(0, Q, size=B).astype(np.int32))
    qdata = jnp.asarray(rng.rand(B, Q).astype(np.float32))
    f = jax.jit(lambda s, q: jnp.sum(
        (jax.nn.one_hot(s, Q, dtype=jnp.float32)) * q, axis=1))
    print(f"onehot pop B=1M Q8:   {timeit(f, qsize, qdata)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
