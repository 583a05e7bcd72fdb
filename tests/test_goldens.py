"""Golden-image regression tests: every workload's tiny render is pinned.

The reference's acceptance record is its README checklists + human eyes
(SURVEY.md §4); here each workload has a committed golden array.  Regenerate
deliberately with::

    python -c "..."   # see tests/goldens/ generation snippet in git history

A golden change in a PR means the renderer's semantics changed — that should
be intentional and explained.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

RT_KW = dict(width=32, height=24, spp=2, max_bounces=3)
SPECIAL_KW = {
    "evolve": dict(width=32, height=32, grid=2, generations=1),
    "uv-image": dict(width=32, height=24),
    "blur": dict(width=32, height=24),
    "buffer": dict(width=32, height=24),
}


def _workload_names():
    return sorted(p[:-4] for p in os.listdir(GOLDEN_DIR) if p.endswith(".npy"))


@pytest.mark.parametrize("name", _workload_names())
def test_golden(name):
    from raytracing_tests_tpu.models import get_workload

    w = get_workload(name)
    kw = SPECIAL_KW.get(name, RT_KW if w.category == "raytracing" else {})
    out = w.run(**kw)
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
    np.testing.assert_allclose(
        np.asarray(out["image"], np.float32),
        golden,
        atol=2e-5,
        err_msg=f"golden drift in workload '{name}'",
    )
