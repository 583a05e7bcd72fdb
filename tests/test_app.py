"""App layer: CLI surface, checkpointing, scaling harness, debug guards,
throughput metering."""

import os

import numpy as np
import optax
import pytest

import jax.numpy as jnp

from raytracing_tests_tpu.app import checkpoint as ckpt
from raytracing_tests_tpu.diff import TrainState, make_train_step, params_mask
from raytracing_tests_tpu.ops.render import RenderConfig, render_jit
from raytracing_tests_tpu.scene import examples
from raytracing_tests_tpu.utils import debug as dbg
from raytracing_tests_tpu.utils.profiling import ThroughputMeter


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=16, height=12, spp=1, max_bounces=2)
    target = np.asarray(render_jit(scene, cam, cfg)["image"])
    pert = scene.replace(color=scene.color * 0.7)
    opt = optax.adam(1e-2)
    step = make_train_step(pert, cam, cfg, opt, trainable=params_mask(pert, "color"))
    st = TrainState.create(pert, opt)
    st, loss = step(st, target)
    return st, step, target


def test_checkpoint_roundtrip_resumes_identically(trained, tmp_path):
    st, step, target = trained
    d = str(tmp_path / "ckpts")
    ckpt.save_train_state(d, st, 1)
    st2, k = ckpt.restore_train_state(d, st)
    assert k == 1
    _, la = step(st, target)
    _, lb = step(st2, target)
    assert np.isclose(float(la), float(lb), rtol=1e-6)


def test_checkpoint_latest_selection(trained, tmp_path):
    st, _, _ = trained
    d = str(tmp_path / "ckpts")
    ckpt.save_train_state(d, st, 5)
    ckpt.save_train_state(d, st, 20)
    ckpt.save_train_state(d, st, 10)
    assert ckpt.latest_checkpoint(d).endswith("ckpt_20.npz")
    _, k = ckpt.restore_train_state(d, st)
    assert k == 20


def test_checkpoint_empty_dir(tmp_path):
    st, k = ckpt.restore_train_state(str(tmp_path / "nope"), None)
    assert st is None and k == 0


def test_cli_list_and_render(tmp_path, capsys):
    from raytracing_tests_tpu.app.cli import main

    main(["list"])
    out = capsys.readouterr().out
    assert "materials" in out and "evolve" in out

    png = str(tmp_path / "r.png")
    main(["render", "sphere", "--width", "16", "--height", "12", "--out", png])
    assert os.path.exists(png)


def test_cli_train_with_checkpoints(tmp_path):
    from raytracing_tests_tpu.app.cli import main

    cdir = str(tmp_path / "ck")
    main([
        "train", "sphere", "--steps", "4", "--width", "16", "--height", "12",
        "--spp", "1", "--ckpt-dir", cdir, "--ckpt-every", "2",
    ])
    assert ckpt.latest_checkpoint(cdir) is not None


def test_scaling_report_runs_on_virtual_mesh():
    from raytracing_tests_tpu.parallel.multihost import scaling_report

    scene, cam = examples.materials_scene()
    cfg = RenderConfig(width=16, height=16, spp=1, max_bounces=2)
    rows = scaling_report(scene, cam, cfg, [1, 2])
    assert rows[0]["devices"] == 1 and rows[0]["efficiency"] == 1.0
    assert rows[1]["devices"] == 2 and rows[1]["rays_per_s"] > 0


def test_check_finite_render_passes():
    scene, cam = examples.sphere_scene()
    cfg = RenderConfig(width=8, height=6, spp=1, max_bounces=2)
    from raytracing_tests_tpu.ops.render import render

    checked = dbg.check_finite_render(lambda: render(scene, cam, cfg))
    out = checked()
    assert np.isfinite(np.asarray(out["image"])).all()


def test_assert_finite_tree_raises():
    bad = {"x": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError):
        dbg.assert_finite_tree(bad)
    dbg.assert_finite_tree({"x": jnp.ones(3)})  # no raise


def test_throughput_meter():
    m = ThroughputMeter()
    with m.frame(1_000_000):
        pass
    assert m.rays == 1_000_000 and m.mrays_per_s > 0


def test_keep_last_good_rejects_nan_step():
    from raytracing_tests_tpu.utils.resilience import KeepLastGood

    state = {"w": jnp.ones(3)}
    guard = KeepLastGood(state)

    s1, loss = guard.step(lambda s: ({"w": s["w"] * 2.0}, 0.5))
    assert float(s1["w"][0]) == 2.0
    s2, loss = guard.step(lambda s: ({"w": s["w"] * float("nan")}, 0.1))
    assert float(s2["w"][0]) == 2.0 and guard.rejected == 1


def test_retry_on_device_error_passes_through():
    from raytracing_tests_tpu.utils.resilience import retry_on_device_error

    calls = []

    def fn(x):
        calls.append(x)
        return x + 1

    assert retry_on_device_error(fn)(41) == 42

    def boom(_):
        raise ValueError("deterministic")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        retry_on_device_error(boom)(0)
