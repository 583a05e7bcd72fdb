#!/usr/bin/env python
"""Ablation timing of the persistent kernel's per-iteration components.

Run via: UBER_ABLATE=<part> python scripts/ablate_uber.py <tag>
(the env var must be set before the kernels import, so this script runs
ONE configuration per process; drive it from ablate_all.sh)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from _bench_util import run

from raytracing_tests_tpu.kernels.uber import render_uber
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.scene import examples


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "UBER_ABLATE", "base")
    order = os.environ.get("UBER_ORDER", "sample")
    L = int(os.environ.get("UBER_L", 2048))
    R = int(os.environ.get("UBER_R", 96))
    gr = int(os.environ.get("UBER_GR", 64))
    n = int(os.environ.get("UBER_N", 3))
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)
    tile = os.environ.get("UBER_TILE") or None
    if tile and tile != "auto":
        tile = tuple(int(x) for x in tile.split("x"))
    out = render_uber(s, c, cfg, L=L, R=R, gr=gr, qcap=3, order=order,
                      tile=tile)
    import jax as _jax
    _jax.block_until_ready(out["image"])
    iters = int(out["iters"])
    print(f"[{tag}] iters={iters} occ={iters * L / int(out['rays']):.3f}x "
          f"groups/iter={int(out['groups_entered']) / max(iters, 1):.2f}",
          flush=True)
    run(f"ablate[{tag or 'base'}|{order}|L{L}R{R}gr{gr}|tile{tile}]",
        lambda: render_uber(s, c, cfg, L=L, R=R, gr=gr, qcap=3,
                            order=order, tile=tile), n=n)


if __name__ == "__main__":
    main()
