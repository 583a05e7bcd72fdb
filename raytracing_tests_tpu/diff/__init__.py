"""Differentiable rendering: scene-parameter gradients + optimization.

The reference has no gradients (it is a forward-only interactive sandbox);
this subsystem is the BASELINE.json north star: rendered pixels differentiable
w.r.t. sphere centers/radii (position/scale), material albedo/fuzz/IOR and
texture parameters, with scene-parameter gradients all-reduced across the
device mesh (via the ``shard_map`` transpose) during the backward bounce loop.
"""

from raytracing_tests_tpu.diff.params import (  # noqa: F401
    SceneParams,
    apply_params,
    extract_params,
    params_mask,
)
from raytracing_tests_tpu.diff.train import (  # noqa: F401
    TrainState,
    banded_value_and_grad,
    probe_band_pops,
    probe_max_pops,
    make_train_step,
    render_loss,
)
