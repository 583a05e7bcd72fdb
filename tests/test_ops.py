"""Tests for the compute workloads: blur, APT evolution, projections,
and the workload registry itself."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from raytracing_tests_tpu.ops import apt, compute_basics
from raytracing_tests_tpu.scene import projection as proj
from raytracing_tests_tpu.scene.textures import cube_sphere_uv

# ---------------------------------------------------------------------------
# compute basics
# ---------------------------------------------------------------------------


def test_uv_gradient_corners():
    img = np.asarray(compute_basics.uv_gradient(64, 32))
    assert img.shape == (32, 64, 3)
    assert img[0, 0, 0] < 0.02 and img[0, -1, 0] > 0.98  # u ramps over x
    assert img[0, 0, 1] < 0.02 and img[-1, 0, 1] > 0.98  # v ramps over y
    np.testing.assert_allclose(img[..., 2], 0.25)


def test_box_blur_matches_naive(rng):
    img = rng.uniform(0, 1, (9, 11, 3)).astype(np.float32)
    r = 1
    out = np.asarray(compute_basics.box_blur(jnp.asarray(img), radius=r, iterations=1))
    # naive edge-clamped window mean
    ref = np.zeros_like(img)
    H, W = img.shape[:2]
    for y in range(H):
        for x in range(W):
            acc = np.zeros(3)
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    acc += img[np.clip(y + dy, 0, H - 1), np.clip(x + dx, 0, W - 1)]
            ref[y, x] = acc / (2 * r + 1) ** 2
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_box_blur_iterations_monotone():
    """More iterations -> progressively flatter image (ping-pong semantics)."""
    img = np.asarray(compute_basics.uv_gradient(16, 16))
    stds = [
        float(np.asarray(compute_basics.box_blur(jnp.asarray(img), 3, it)).std())
        for it in (1, 5, 30)
    ]
    assert stds[0] < img.std() and stds[1] < stds[0] and stds[2] < stds[1]


def test_buffer_transform():
    buf = jnp.arange(8, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(compute_basics.buffer_transform(buf, 3.0, 1.0)),
        np.arange(8) * 3.0 + 1.0,
    )


# ---------------------------------------------------------------------------
# APT
# ---------------------------------------------------------------------------


def _eval_tree(t, x, y):
    """Independent recursive evaluator mirroring APT::Eval (APT.cpp:115-167)."""
    kids = [_eval_tree(c, x, y) for c in t.children]
    D = math.pi / 180
    op = t.op
    if op == apt.CONST:
        return t.data
    if op == apt.OPX:
        return x
    if op == apt.OPY:
        return y
    a = kids[0] if kids else 0.0
    b = kids[1] if len(kids) > 1 else 0.0
    c = kids[2] if len(kids) > 2 else 0.0
    if op == apt.MAX:
        return max(a, b)
    if op == apt.MIN:
        return min(a, b)
    if op == apt.ATAN2:
        return math.atan2(b * D, a * D)
    if op == apt.SIN:
        return math.sin(a * D)
    if op == apt.COS:
        return math.cos(a * D)
    if op == apt.TAN:
        return math.tan(a * D)
    if op == apt.ATAN:
        return math.atan(a * D)
    if op == apt.LERP:
        return a + c * (b - a)
    if op == apt.PLUS:
        return b + a
    if op == apt.MINUS:
        return a - b
    if op == apt.MULT:
        return b * a
    if op == apt.DIV:
        if b == 0:
            return float("nan") if a == 0 else math.copysign(float("inf"), a)
        return a / b
    if op == apt.NEGATE:
        return -a
    if op == apt.SQUARE:
        return a * a
    if op == apt.CEIL:
        return float(int(a)) + 1
    if op == apt.LOG2:
        if a > 0:
            return math.log2(a)
        return float("-inf") if a == 0 else float("nan")
    if op == apt.ABS:
        return abs(a)
    if op == apt.CLIP:
        return b if a > b else (-b if a < -b else a)
    if op == apt.FLOOR:
        return float(int(a))
    if op == apt.WRAP:
        return -1 + 2 * (((a + 1) / 2) - int((a + 1) / 2))
    raise ValueError(op)


def test_apt_serialize_roundtrip(rng):
    nrng = np.random.default_rng(3)
    for _ in range(20):
        t = apt.random_tree(nrng, depth=5)
        prog = apt.serialize(t)
        t2 = apt.deserialize(prog)
        assert apt.serialize(t2).tolist() == prog.tolist()


def test_apt_stack_machine_matches_recursive():
    nrng = np.random.default_rng(7)
    matched = 0
    total = 30
    for _ in range(total):
        t = apt.random_tree(nrng, depth=4)
        prog = apt.serialize(t)
        xv = 3.0 * np.ones((2, 2), np.float32)
        yv = 5.0 * np.ones((2, 2), np.float32)
        out = float(np.asarray(apt.evaluate_program(prog, xv, yv))[0, 0])
        try:
            ref = _eval_tree(t, 3.0, 5.0)
        except (OverflowError, ValueError):
            matched += 1
            continue
        if (
            (np.isnan(ref) and np.isnan(out))
            or (np.isinf(ref) and np.isinf(out))
            or np.isclose(out, np.float32(ref), rtol=1e-4, atol=1e-5)
        ):
            matched += 1
    assert matched == total


def test_apt_evolution_deterministic():
    a = apt.EvolvingPictures(grid=2, seed=5)
    b = apt.EvolvingPictures(grid=2, seed=5)
    a.pick(1)
    b.pick(1)
    np.testing.assert_array_equal(np.asarray(a.programs()), np.asarray(b.programs()))
    assert a.generation == 1


def test_apt_program_length_guard():
    nrng = np.random.default_rng(0)
    big = apt.random_tree(nrng, depth=3)
    while big.size() <= apt.MAX_PROGRAM:
        big = apt.Node(apt.PLUS, 0.0, [big.copy(), big.copy()])
    with pytest.raises(AssertionError):
        apt.serialize(big)


# ---------------------------------------------------------------------------
# projections
# ---------------------------------------------------------------------------


def test_face_uv_dir_inverse(rng):
    face = rng.integers(0, 6, 300)
    u = rng.uniform(0.05, 0.95, 300).astype(np.float32)
    v = rng.uniform(0.05, 0.95, 300).astype(np.float32)
    d = proj._face_uv_to_dir(jnp.asarray(face), jnp.asarray(u), jnp.asarray(v))
    f2, u2, v2 = cube_sphere_uv(d)
    np.testing.assert_array_equal(np.asarray(f2), face)
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-6)


def test_mercator_cubic_roundtrip_smooth():
    H, W = 48, 96
    v, u = np.meshgrid(np.arange(H) / H, np.arange(W) / W, indexing="ij")
    img = np.stack([u, v, 0.5 + 0.3 * np.sin(2 * np.pi * u)], -1).astype(np.float32)
    atlas = proj.mercator_to_cubic(img, bilinear=True)
    back = np.asarray(proj.cubic_to_mercator(atlas, bilinear=True))
    err = np.abs(back[8:-8, 4:-4] - img[8:-8, 4:-4])
    assert err.mean() < 0.02, err.mean()


def test_mercator_uv_dir_inverse(rng):
    u = rng.uniform(0.02, 0.98, 200).astype(np.float32)
    v = rng.uniform(0.05, 0.95, 200).astype(np.float32)
    d = proj._mercator_uv_to_dir(jnp.asarray(u), jnp.asarray(v))
    u2, v2 = proj._dir_to_mercator_uv(d)
    np.testing.assert_allclose(np.asarray(u2), u, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-5)


# ---------------------------------------------------------------------------
# workload registry
# ---------------------------------------------------------------------------


def test_registry_lists_all_reference_workloads():
    from raytracing_tests_tpu.models import list_workloads

    names = {w.name for w in list_workloads()}
    expected = {
        "uv-image", "blur", "evolve", "buffer", "sphere", "groups", "materials",
        "motion-blur", "bvh", "texturing", "lights", "iow-final",
    }
    assert expected <= names, expected - names


def test_registry_duplicate_name_guard():
    from raytracing_tests_tpu.models.registry import register

    with pytest.raises(AssertionError):
        register("sphere", "dup")(lambda: None)


@pytest.mark.parametrize(
    "name", ["sphere", "groups", "materials", "motion-blur", "bvh", "texturing", "lights"]
)
def test_raytracing_workloads_run(name):
    from raytracing_tests_tpu.models import get_workload

    out = get_workload(name).run(width=16, height=12, spp=1, max_bounces=2)
    img = np.asarray(out["image"])
    assert img.shape == (12, 16, 3)
    assert np.isfinite(img).all()


@pytest.mark.parametrize("name", ["uv-image", "blur", "buffer", "evolve"])
def test_compute_workloads_run(name):
    from raytracing_tests_tpu.models import get_workload

    out = get_workload(name).run(width=16, height=16, grid=2, generations=1, n=32)
    assert "image" in out
    assert np.isfinite(np.asarray(out["image"])).all() or name == "evolve"


def test_apt_reference_grid_scale():
    """The full 4x4 grid-of-pictures loop at the reference's interactive
    resolution: render, pick, re-render — shapes and finiteness."""
    import jax
    import numpy as np

    from raytracing_tests_tpu.ops.apt import EvolvingPictures

    ev = EvolvingPictures(grid=4, seed=1, depth=5)
    imgs = jax.block_until_ready(ev.render_grid(128, 128))
    assert imgs.shape == (16, 128, 128, 3)
    ev.pick(3)
    imgs2 = jax.block_until_ready(ev.render_grid(128, 128))
    # Raw APT values are unbounded (divide/exp nodes legitimately produce
    # inf, exactly like the GLSL kernel) — assert no NaN-poisoning of the
    # winner's picture and that breeding actually changed the grid.
    a, b = np.asarray(imgs), np.asarray(imgs2)
    assert not np.array_equal(np.nan_to_num(a), np.nan_to_num(b))
    assert np.isfinite(np.asarray(imgs2[0])).any()  # winner re-renders
