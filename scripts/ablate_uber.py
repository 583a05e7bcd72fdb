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
    s, c = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=100, max_bounces=8,
                       intersector="pallas").for_scene(s)
    run(f"ablate[{tag or 'base'}|{order}]",
        lambda: render_uber(s, c, cfg, L=2048, R=96, gr=64, qcap=3,
                            order=order), n=3)


if __name__ == "__main__":
    main()
