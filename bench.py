#!/usr/bin/env python
"""Headline benchmark: Mrays/s/chip on the In-One-Weekend final scene.

BASELINE.md metric: Mrays/s/chip at 800x450x100spp (the reference publishes
no numbers — SURVEY.md §6 — so the target derives from BASELINE.json's
north star: >= 1 Grays/s aggregate on a v4-16, i.e. 62.5 Mrays/s/chip).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "Mrays/s/chip", "vs_baseline": N}

Every (non-smoke) run also:
  - times ALL FIVE BASELINE.json configs (motion / bvh1k / texturing /
    lights, + the extra materials-shading config) into bench_details.json;
  - runs an on-chip PARITY CANARY: one small frame through the persistent
    megakernel AND the XLA queue renderer, asserting the statistical
    envelope (mean image diff, ray counts, depth agreement) — the chip-only
    regression gate the CPU test suite cannot be (the bf16-elision
    corruption of commit caa72cc was invisible to all CPU tests).

Env knobs:
  BENCH_SMOKE=1     tiny config for CI/CPU smoke runs (headline only)
  BENCH_CHUNK=N     lanes per lax.map step (peak-memory bound)
  BENCH_SPP=N       override samples per pixel (headline config)
  BENCH_RENDERER    uber (default) | megalanes | queue | workqueue
  BENCH_SKIP_SIDE=1 headline + canary only (skip the four side configs)
"""

import json
import os
import time

import jax
import numpy as np

# Persistent compilation cache: the five-config sweep compiles ~7 Pallas
# programs; cached, a bench re-run spends its time measuring, not
# compiling (first-ever run still pays the trace+compile).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The tunneled TPU occasionally flaps: backend init (triggered by the
# first traced op during package import) raises UNAVAILABLE for minutes
# at a time (observed round 5).  Python drops failed modules from
# sys.modules, so a delayed re-import retries the init cleanly.
def _transient(e) -> bool:
    return any(m in str(e) for m in
               ("UNAVAILABLE", "Unable to initialize backend",
                "remote_compile", "DEADLINE_EXCEEDED"))


for _attempt in range(4):
    try:
        from raytracing_tests_tpu.ops.render import (
            RenderConfig, render_stats, extract_lights)
        from raytracing_tests_tpu.scene import examples
        break
    except Exception as _e:  # noqa: PERF203
        if not _transient(_e) or _attempt == 3:
            raise
        import sys as _sys

        print(f"# transient backend error on import "
              f"(attempt {_attempt + 1}/4), retrying in 120 s: "
              f"{str(_e).splitlines()[0]}", file=_sys.stderr)
        time.sleep(120)

BASELINE_MRAYS_PER_CHIP = 62.5  # 1 Grays/s / 16 chips (BASELINE.md)


def _make_fn(renderer, cfg, chunk, R=96, L=2048, qcap="auto", stage=0):
    if renderer == "uber":
        from raytracing_tests_tpu.kernels.uber import render_uber

        # qcap=3: a shallower in-VMEM LIFO is measurably faster (fewer
        # scratch rows per push/pop) and the headline scene's refraction
        # trees never exceed depth 3 — rays_dropped is asserted 0 below,
        # and time_config FALLS BACK to the full reference stack depth if
        # the shallow stack ever drops a ray (deeper glass nesting on a
        # new scene degrades to the untuned speed, never to lost rays).
        # (materials shading keeps the full stack: no contribution cutoff.)
        if qcap == "auto":
            qcap = 3 if cfg.shading == "bvh" else None
        return lambda s, c, lt: render_uber(s, c, cfg, lights=lt, L=L,
                                            R=R, gr=64, qcap=qcap,
                                            stage=stage)
    if renderer == "megalanes":
        from raytracing_tests_tpu.ops.megalanes import render_megalanes

        return lambda s, c, lt: render_megalanes(
            s, c, cfg, chunk=chunk, gr=128, schedule="natural")
    if renderer == "workqueue":
        from raytracing_tests_tpu.ops.workqueue import render_workqueue

        return lambda s, c, lt: render_workqueue(s, c, cfg, chunk=chunk)
    return jax.jit(lambda s, c, lt: render_stats(s, c, cfg, lt))


def time_config(scene, camera, cfg, renderer, chunk, lights=None, n_iters=3,
                R=96, L=2048, stage=0):
    """Compile + warm, then time ``n_iters`` frames; returns a detail dict."""
    scene = jax.device_put(scene)
    camera = jax.device_put(camera)
    fn = _make_fn(renderer, cfg, chunk, R=R, L=L, stage=stage)
    out = fn(scene, camera, lights)
    jax.block_until_ready(out["image"])
    if renderer == "uber" and int(out.get("rays_dropped", 0)) > 0:
        # The qcap=3 tune dropped rays on this scene (deeper refraction
        # nesting than the headline family): fall back to the full
        # reference stack depth and remeasure honestly.
        fn = _make_fn(renderer, cfg, chunk, R=R, L=L, qcap=None,
                      stage=stage)
        out = fn(scene, camera, lights)
        jax.block_until_ready(out["image"])
    rays = int(out["rays"])
    # Per-frame timing, BEST of n: the chip rides a shared tunnel whose
    # dispatch/transfer weather is bimodal (same code measured 41.5 and
    # 55.4 Mrays/s twenty minutes apart) — the min frame is the renderer's
    # throughput, the mean is the weather (both recorded).
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = fn(scene, camera, lights)
        jax.block_until_ready(out["image"])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "rays_per_frame": rays,
        "seconds_per_frame": dt,
        "seconds_per_frame_mean": sum(times) / len(times),
        "rays_dropped": int(out.get("rays_dropped", 0)),
        "renderer": renderer,
        "intersector": cfg.intersector,
        "size": f"{cfg.width}x{cfg.height}x{cfg.spp}spp d{cfg.max_bounces}",
        "mean_image": float(np.asarray(out["image"]).mean()),
    }


def parity_canary(chunk):
    """Uber vs queue on one small iow-final frame, on whatever backend this
    bench runs on.  Asserts the statistical envelope (grazing-sample ulp
    flips are expected across compilation contexts — PERFORMANCE.md fact
    14); everything structural must agree.  Returns a detail dict."""
    scene, camera = examples.iow_final_scene()
    cfg = RenderConfig(width=200, height=112, spp=8, max_bounces=6,
                       lane_chunk=chunk,
                       intersector="pallas").for_scene(scene)
    from raytracing_tests_tpu.kernels.uber import render_uber

    ou = render_uber(scene, camera, cfg, L=2048, R=8, gr=64)
    oq = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, camera)
    iu = np.asarray(ou["image"])
    iq = np.asarray(oq["image"])
    ru, rq = int(ou["rays"]), int(oq["rays"])
    mean_diff = float(np.abs(iu.mean(axis=(0, 1)) - iq.mean(axis=(0, 1))).max())
    ray_ratio = ru / max(rq, 1)
    du = np.asarray(ou["depth"])
    dq = np.asarray(oq["depth"])
    depth_near = np.minimum(du, 100.0)
    depth_disagree = float(
        (np.abs(depth_near - np.minimum(dq, 100.0)) > 1e-2).mean())
    detail = {
        "mean_image_diff": mean_diff,
        "ray_count_ratio": ray_ratio,
        "depth_disagree_frac": depth_disagree,
        "rays_dropped": int(ou["rays_dropped"]),
    }
    ok = (mean_diff < 5e-3 and abs(ray_ratio - 1.0) < 0.02
          and depth_disagree < 0.01 and int(ou["rays_dropped"]) == 0)
    detail["ok"] = bool(ok)
    return detail


def side_configs(chunk):
    """The other four BASELINE.json benchmark configs (16 spp keeps the
    whole sweep to a few frames each; the headline stays 100 spp).
    Each entry: (scene, camera, cfg, lights, renderer[, R])."""
    mk = lambda scene, **kw: RenderConfig(
        width=800, height=450, spp=16, max_bounces=8, lane_chunk=chunk,
        intersector="pallas", **kw,
    ).for_scene(scene)
    out = {}
    # Per-config renderer + (R[, L]) tunes from the round-5 post-dispatch-
    # fix in-process ladders (PERFORMANCE.md facts 45-46).  Motion routes
    # BACK to the persistent kernel: the round-4 "small-scene crossover"
    # to the queue renderer (old fact 36) was the per-frame host-dispatch
    # tax, not the kernel (uber 171.8 vs queue 42.5 Mrays/s same-window).
    s, c = examples.motion_blur_scene()
    out["motion"] = (s, c, mk(s), None, ("uber", 32))
    s, c = examples.bvh_grid_scene(side=32)  # 1,025 objects, generic mode
    out["bvh1k"] = (s, c, mk(s), None, "uber")  # persistent generic kernel
    # Texturing: L=1024 (L=2048 with the VMEM-resident atlas splits OOMs
    # scoped VMEM); R-insensitive post-fix (90.6-91.1 at R32/48/64).
    s, c = examples.texturing_scene()
    out["texturing"] = (s, c, mk(s), None, ("uber", 64, 1024))
    # Lights: R64 ~ R96 (106.7 / 105.8); the spp<=32 lane rotation's
    # drain cut is real wall clock post-fix (rot-on 106.7 vs off 102.8).
    s, c = examples.lights_scene()
    out["lights"] = (s, c, mk(s), extract_lights(s), ("uber", 64))
    # Extra (beyond BASELINE.json's five): the IOW-03 materials shading
    # model on the persistent kernel.  R48 won the round-5 ladder (148.4
    # vs 117.3 at R96).
    s, c = examples.materials_scene()
    out["materials"] = (s, c, mk(s, shading="materials"), None, ("uber", 48))
    return out


def grad_config(chunk):
    """Gradient-step timing at BASELINE scale (800x450x16spp d8, banded
    fastpath) — the backward path's regression trail (VERDICT r4 item 4;
    the 30.16 s/step figure previously lived only in PERFORMANCE.md prose).

    Mrays/s-equivalent = the FORWARD's traced-ray count / grad-step time
    (one full forward ride inside the step, so the ratio to the forward
    number is the backward's cost factor)."""
    import jax.numpy as jnp

    from raytracing_tests_tpu.diff import (banded_value_and_grad,
                                           extract_params, probe_band_pops)

    scene, cam = examples.iow_final_scene()
    cfg = RenderConfig(width=800, height=450, spp=16, max_bounces=8,
                       lane_chunk=chunk,
                       intersector="pallas").for_scene(scene)
    fwd = jax.jit(lambda s, c: render_stats(s, c, cfg))(scene, cam)
    rays = int(fwd["rays"])
    target = jnp.asarray(fwd["image"])
    pert = scene.replace(color=scene.color * 0.8 + 0.1)
    p = extract_params(pert)
    # Smallest divisor of H keeping each band's live set <= ~300k samples
    # (the banded-backward memory bound; 25 bands at this config).
    want = max(1, -(-cfg.width * cfg.height * cfg.spp // 300_000))
    bands = min(b for b in range(want, cfg.height + 1) if cfg.height % b == 0)
    # Probed per-band reverse-scan depths (+2 drift margin): exact, and
    # sky bands stop paying the glass bands' 17-pop budget
    # (diff.train.probe_band_pops; iow-final mean band depth 12.1).
    pops = [p + 2 for p in probe_band_pops(pert, cam, cfg, bands)]
    gr = jax.jit(banded_value_and_grad(pert, cam, cfg, grad_bands=bands,
                                       band_pops=pops))
    out = gr(p, target)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = gr(p, target)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "seconds_per_step": dt,
        "mrays_equiv_per_s": round(rays / dt / 1e6, 2),
        "rays_forward": rays,
        "grad_bands": bands,
        "grad_band_pops": pops,
        "loss": float(out[0]),
        "size": f"{cfg.width}x{cfg.height}x{cfg.spp}spp d{cfg.max_bounces}",
        "path": "banded fastpath (detached winners + closed-form recompute)",
    }


def main():
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    if smoke:
        width, height, spp = 80, 45, 4
        scene, camera = examples.materials_scene()
        chunk = int(os.environ.get("BENCH_CHUNK", 16384))
    else:
        width, height, spp = 800, 450, int(os.environ.get("BENCH_SPP", 100))
        scene, camera = examples.iow_final_scene()
        chunk = int(os.environ.get("BENCH_CHUNK", 1048576))

    cfg = RenderConfig(
        width=width,
        height=height,
        spp=spp,
        max_bounces=8,
        lane_chunk=chunk,
        intersector=os.environ.get("BENCH_INTERSECTOR", "pallas"),
    ).for_scene(scene)
    renderer = os.environ.get("BENCH_RENDERER", "uber")

    # n_iters=8: more draws for the best-frame statistic; with the round-5
    # dispatch fixes (fact 45: jitted epilogue + identity-keyed packing
    # caches) frame times are stable to ~0.3%, so best ~= med ~= mean.
    # stage (the staged flush, fact 44) measured neutral kernel-only and
    # stays off.
    head = time_config(scene, camera, cfg, renderer, chunk,
                       n_iters=1 if smoke else 8)
    assert head["rays_dropped"] == 0, head  # honest ray accounting
    mrays = head["mrays_per_s"]

    details = {
        "device": str(jax.devices()[0]),
        "platform": jax.devices()[0].platform,
        "lane_chunk": chunk,
        "configs": {"iow-final": head},
    }
    parity_ok = None
    if not smoke:
        details["parity_canary"] = parity_canary(chunk)
        parity_ok = details["parity_canary"]["ok"]
        if os.environ.get("BENCH_SKIP_SIDE") != "1":
            for name, (s, c, scfg, lights, srend) in side_configs(chunk).items():
                if not isinstance(srend, tuple):
                    srend = (srend,)
                srend, R, L = srend + ((96, 2048), (2048,), ())[len(srend) - 1]
                try:
                    # min-of-4: the tunnel's dispatch weather is bimodal
                    # (PERFORMANCE.md facts 24/37) — 2 frames undersample.
                    details["configs"][name] = time_config(
                        s, c, scfg, srend, chunk, lights=lights, n_iters=4,
                        R=R, L=L)
                except Exception as e:  # record, keep the sweep going
                    details["configs"][name] = {
                        "error": f"{type(e).__name__}: {e}"}
        if os.environ.get("BENCH_SKIP_GRAD") != "1":
            # One retry: the tunnel's remote-compile endpoint occasionally
            # drops a long compile mid-body (transient INTERNAL errors).
            for attempt in (0, 1):
                try:
                    details["configs"]["grad"] = grad_config(chunk)
                    break
                except Exception as e:
                    details["configs"]["grad"] = {
                        "error": f"{type(e).__name__}: {e}"}

    line = {
        "metric": f"Mrays/s/chip {'smoke' if smoke else 'iow-final'} {width}x{height}x{spp}spp d{cfg.max_bounces}",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 3),
    }
    if parity_ok is not None:
        line["parity_ok"] = parity_ok
    print(json.dumps(line))
    if not smoke:  # a smoke run must not clobber the real artifact
        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)
            f.write("\n")
    if parity_ok is False:
        raise SystemExit("parity canary FAILED: " +
                         json.dumps(details["parity_canary"]))


if __name__ == "__main__":
    # The tunneled TPU occasionally flaps (backend init raises UNAVAILABLE
    # for minutes at a time — observed round 5).  The driver runs this
    # once; retry the whole bench through a short outage rather than
    # recording a weather failure as the round's artifact.
    for _attempt in range(4):
        try:
            main()
            break
        except SystemExit:
            raise
        except Exception as e:
            if not _transient(e) or _attempt == 3:
                raise
            print(f"# transient backend error (attempt {_attempt + 1}/4), "
                  f"retrying in 120 s: {str(e).splitlines()[0]}",
                  file=__import__('sys').stderr)
            time.sleep(120)
