#!/usr/bin/env python
"""Interleaved A/B: dielectric-only probe sub-table vs full-table probe.

Variant A = current accel (trailing probe groups).  Variant B = same accel
with the probe rows stripped (n_pgroups=0 -> _shade_hits probes the full
main table, the pre-change behavior).  Interleaved x3 to ride out chip
noise.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracing_tests_tpu.kernels import uber
from raytracing_tests_tpu.kernels.sweep2 import Accel2, make_accel2
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def strip_probe(accel: Accel2) -> Accel2:
    G = accel.gaabb.shape[0] - accel.n_pgroups
    n_pad = G * accel.gr
    return Accel2(accel.otab[:n_pad], accel.ftab3, accel.gaabb[:G],
                  accel.perm, accel.gr, accel.has_motion, n_pgroups=0)


def main():
    print("device:", jax.devices()[0], flush=True)
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)
    orig = uber.make_accel2

    def timed(tag, n=3):
        out = uber.render_uber(s, c, cfg, L=2048, R=96, gr=64, qcap=3)
        jax.block_until_ready(out["image"])
        rays = int(out["rays"])
        t0 = time.perf_counter()
        for _ in range(n):
            out = uber.render_uber(s, c, cfg, L=2048, R=96, gr=64, qcap=3)
            jax.block_until_ready(out["image"])
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {rays / dt / 1e6:.2f} Mrays/s  ({dt:.3f} s/frame)",
              flush=True)
        return rays / dt / 1e6

    a, b = [], []
    for rep in range(3):
        uber.make_accel2 = orig
        a.append(timed(f"A probe-subtable rep{rep}"))
        uber.make_accel2 = lambda *ar, **kw: strip_probe(orig(*ar, **kw))
        b.append(timed(f"B full-probe     rep{rep}"))
    uber.make_accel2 = orig
    print(f"A mean {sum(a)/len(a):.2f}  B mean {sum(b)/len(b):.2f}")


if __name__ == "__main__":
    main()
