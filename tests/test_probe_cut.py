"""Adversarial tests for ``sweep2.probe_relevant_rows`` — the static
consumer-reachability cut of the surrounding-RI probe table (worth ~27% of
the headline frame, so it must FAIL LOUDLY here if the margin logic ever
regresses).

Property under test: for every probe point the CPU oracle actually
evaluates during a render (``reference.cpu_renderer._surrounding_ri``,
recorded by monkeypatching), the probe restricted to the masked rows
returns the SAME value as the full probe.  Scenes stress the reachability
argument: overlapping opaque+glass pairs, spheres touching within the
4e-3 margin, motion sweeps closing a static gap, overlap CHAINS (the
transitive-closure case), and the documented 1e-4 reflect-spawn epsilon
hole (held to the statistical envelope, not exactness — see the
``probe_relevant_rows`` docstring).

Matches the per-probe AABB-descent cull it replaces:
``01_BoundingVolumeHierarchy/computeShaderSrc.glsl:268-345``.
"""

import numpy as np
import pytest

from raytracing_tests_tpu.kernels.sweep2 import probe_relevant_rows
from raytracing_tests_tpu.ops.render import RenderConfig
from raytracing_tests_tpu.reference import cpu_renderer
from raytracing_tests_tpu.scene.types import Camera, SceneBuilder


def _sur_ri_rows(scene, point, ratio, row_mask=None):
    """Rows the oracle's probe READS at ``point`` (containing, ri != 1),
    plus the probe value — optionally restricted to ``row_mask`` (the
    emulated cut table).  Mirrors ``cpu_renderer._surrounding_ri`` over the
    raw Scene SoA so the mask can be applied in ORIGINAL index space."""
    pos = np.asarray(scene.position)
    rot = np.asarray(scene.rotation)
    scl = np.asarray(scene.scale)
    dp = np.asarray(scene.delta_position)
    typ = np.asarray(scene.obj_type)
    ri = np.asarray(scene.refractive_index)
    valid = np.asarray(scene.valid)
    rows, acc, cnt = [], 0.0, 0
    for j in range(len(valid)):
        if not valid[j] or ri[j] == 1.0:
            continue
        if row_mask is not None and not row_mask[j]:
            continue
        shift = (1.0 - ratio) * dp[j]
        p = (rot[j].T @ (point - pos[j] + shift)) / scl[j]
        inside = (np.dot(p, p) <= 1.0 if int(typ[j]) == 1
                  else bool(np.all(np.abs(p) <= 0.5)))
        if inside:
            rows.append(j)
            acc += ri[j]
            cnt += 1
    return rows, (acc / cnt if acc > 1.0 else 1.0)


def _record_probes(scene, camera, cfg, monkeypatch):
    """Oracle render with every surrounding-RI evaluation recorded."""
    pts = []
    orig = cpu_renderer._surrounding_ri

    def spy(view, point, ratio):
        pts.append((np.array(point), float(ratio)))
        return orig(view, point, ratio)

    monkeypatch.setattr(cpu_renderer, "_surrounding_ri", spy)
    out = cpu_renderer.render_cpu(scene, camera, cfg)
    monkeypatch.setattr(cpu_renderer, "_surrounding_ri", orig)
    return out, pts


def _assert_cut_exact(scene, camera, cfg, monkeypatch, min_probes=10):
    """The masked probe must reproduce the full probe at every point the
    oracle evaluated — i.e. the cut keeps every row that ever answers."""
    mask = probe_relevant_rows(scene)
    assert mask is not None
    _, pts = _record_probes(scene, camera, cfg, monkeypatch)
    assert len(pts) >= min_probes, "scene does not exercise the probe"
    for point, ratio in pts:
        rows, full = _sur_ri_rows(scene, point, ratio)
        rows_m, cut = _sur_ri_rows(scene, point, ratio, row_mask=mask)
        assert rows_m == rows and cut == full, (
            f"cut probe diverges at {point}: full rows {rows} ({full}), "
            f"masked rows {rows_m} ({cut})")
    return mask


def _cam():
    return Camera.make((0.0, 0.0, 4.0), (0.0, 0.0, -1.0), fov_y_deg=55.0,
                       focus_dist=4.0)


def _cfg(scene, spp=2):
    return RenderConfig(width=14, height=10, spp=spp,
                        max_bounces=6).for_scene(scene)


def test_overlapping_opaque_glass_pair(monkeypatch):
    """A dielectric OPAQUE sphere overlapping a glass one hosts probe
    points reached through the glass; a far dielectric decoy must be cut
    and must never answer."""
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.0, refractivity=1.0,
                 refractive_index=1.5, color=(1.0, 1.0, 1.0))
    # Opaque but optically dense (ri != 1, refractivity 0): only readable
    # through the glass it overlaps.
    b.add_sphere((1.2, 0.0, 0.0), 0.8, reflectivity=0.6,
                 refractive_index=1.3, color=(0.8, 0.4, 0.4))
    b.add_sphere((50.0, 0.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.8, color=(0.4, 0.8, 0.4))  # decoy
    scene = b.build()
    mask = _assert_cut_exact(scene, _cam(), _cfg(scene), monkeypatch)
    assert mask[0] and mask[1] and not mask[2]


def test_touching_within_margin(monkeypatch):
    """Spheres whose surface gap is INSIDE the 4e-3 margin: the neighbor
    must stay; a sphere just OUTSIDE it must go."""
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.0, refractivity=1.0,
                 refractive_index=1.5)
    b.add_sphere((2.002, 0.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.3)  # gap 2e-3 < margin
    b.add_sphere((0.0, 2.1, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.3)  # gap 0.1 > margin
    scene = b.build()
    mask = _assert_cut_exact(scene, _cam(), _cfg(scene), monkeypatch)
    assert mask[1] and not mask[2]


def test_motion_closes_gap():
    """A static gap of 0.1 closed by the motion sweep (centers travel
    [c - dp, c]) must keep the neighbor: the pairwise gap is shrunk by
    BOTH amplitudes."""
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.0, refractivity=1.0,
                 refractive_index=1.5)
    b.add_sphere((2.1, 0.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.3, delta_position=(0.2, 0.0, 0.0))
    b.add_sphere((0.0, 2.1, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.3)  # same gap, no motion -> cut
    scene = b.build()
    mask = probe_relevant_rows(scene)
    assert mask[0] and mask[1] and not mask[2]


def test_transitive_overlap_chain(monkeypatch):
    """Interiors chain through overlap: glass A overlaps B, B overlaps C,
    D touches only C.  One-hop hosts (refractive + direct touchers) would
    cut D; the transitive closure must keep it."""
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.0, refractivity=1.0,
                 refractive_index=1.5)  # A (seed)
    b.add_sphere((1.5, 0.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.2)  # B overlaps A
    b.add_sphere((3.0, 0.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.3)  # C overlaps B, not A
    b.add_sphere((5.001, 0.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.4)  # D within margin of C only
    b.add_sphere((0.0, 40.0, 0.0), 1.0, reflectivity=0.5,
                 refractive_index=1.6)  # E isolated -> cut
    scene = b.build()
    mask = probe_relevant_rows(scene)
    assert list(mask[:5]) == [True, True, True, True, False]
    # And the cut stays exact on an actual render of the chain.
    _assert_cut_exact(scene, _cam(), _cfg(scene), monkeypatch)


def test_generic_mode_aabb_gap(monkeypatch):
    """Generic scenes (boxes present) use the conservative world-AABB gap;
    an overlapping dielectric box stays, a distant one goes."""
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 0.0), 1.0, refractivity=1.0,
                 refractive_index=1.5)
    b.add_box((1.1, 0.0, 0.0), (1.2, 1.2, 1.2), reflectivity=0.5,
              refractive_index=1.3)
    b.add_box((30.0, 0.0, 0.0), (1.0, 1.0, 1.0), reflectivity=0.5,
              refractive_index=1.3)
    scene = b.build()
    mask = _assert_cut_exact(scene, _cam(), _cfg(scene), monkeypatch)
    assert mask[1] and not mask[2]


def test_reflect_spawn_hole_within_envelope(monkeypatch):
    """The documented epsilon hole: a reflect child spawns 1e-4 outside its
    winner, which can sit 1e-4 INSIDE an overlapping opaque neighbor —
    reaching an interior without refraction.  The cut is allowed to differ
    there, but only inside the statistical envelope: the cut-vs-full
    oracle IMAGES must still agree to the cross-renderer tolerance."""
    b = SceneBuilder()
    # Mirror sphere half-buried in a dielectric opaque slab: reflect
    # children off the mirror spawn epsilon-inside the slab.
    b.add_sphere((0.0, 0.0, 0.0), 1.0, reflectivity=0.9,
                 refractive_index=1.0)  # pure mirror, ri 1 (not a probe row)
    b.add_box((0.0, -1.0, 0.0), (8.0, 2.0, 8.0), reflectivity=0.3,
              refractive_index=1.25)  # overlaps the mirror
    b.add_sphere((2.5, 0.5, 0.0), 0.7, refractivity=1.0,
                 refractive_index=1.5)  # glass keeps the probe table alive
    scene = b.build()
    cfg = _cfg(scene, spp=2)
    cam = _cam()
    mask = probe_relevant_rows(scene)
    full = np.asarray(cpu_renderer.render_cpu(scene, cam, cfg)["image"])

    orig = cpu_renderer._surrounding_ri

    def masked(view, point, ratio):
        return _sur_ri_rows(scene, point, ratio, row_mask=mask)[1]

    monkeypatch.setattr(cpu_renderer, "_surrounding_ri", masked)
    cut = np.asarray(cpu_renderer.render_cpu(scene, cam, cfg)["image"])
    monkeypatch.setattr(cpu_renderer, "_surrounding_ri", orig)
    assert np.abs(cut - full).mean() < 5e-3


def test_probe_cache_keyed_on_all_read_fields():
    """Regression (round-5 advisor): ``scene.replace(...)`` variants SHARE
    the position array, so a cache keyed on position identity alone
    returned stale masks when refractivity/ri/valid/scale/motion changed.
    Every array the computation reads must invalidate the cache."""
    from raytracing_tests_tpu.scene import examples

    scene, _ = examples.iow_final_scene()
    mask = probe_relevant_rows(scene)
    assert mask is not None and mask.any()
    # Kill all refraction: no row can feed a refraction child anymore.
    inert = scene.replace(refractivity=np.zeros_like(
        np.asarray(scene.refractivity)))
    assert inert.position is scene.position  # the aliasing precondition
    mask_inert = probe_relevant_rows(inert)
    assert mask_inert is not None and not mask_inert.any(), (
        int(mask_inert.sum()), "stale cached mask returned for a variant")
    # And back: the original scene must still get its original mask.
    again = probe_relevant_rows(scene)
    assert (again == mask).all()
    # An all-air variant (ri == 1 everywhere) has no dielectric rows.
    air = scene.replace(refractive_index=np.ones_like(
        np.asarray(scene.refractive_index)))
    mask_air = probe_relevant_rows(air)
    assert mask_air is not None and not mask_air.any()
