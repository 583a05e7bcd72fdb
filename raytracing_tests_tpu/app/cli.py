"""Command-line interface.

Usage:
  python -m raytracing_tests_tpu list
  python -m raytracing_tests_tpu render <workload> [--width W --height H
        --spp S --bounces B --normals --bvh --mesh N --out out.png
        --depth-out depth.png --progressive --tiles-per-step K
        --texture img.png --texture-mapping mercator|cubic]
  python -m raytracing_tests_tpu train <workload> [--steps N --lr F
        --train-fields color,position --out-dir dir]
  python -m raytracing_tests_tpu watch <workload> --params params.json
        [--out out.png --interval S --max-renders N]
  python -m raytracing_tests_tpu bench [--smoke]

Replaces the reference's compile-time workload selection
(``sandbox.cpp:39-52``) and ImGui runtime knobs with flags; the "Tests Menu"
launcher (``TestsLayerManager.cpp:267-303``) becomes ``list``.
"""

from __future__ import annotations

import argparse
import sys
import time


def _cmd_list(_args):
    from raytracing_tests_tpu.models import list_workloads

    rows = [(w.category, w.name, w.description) for w in list_workloads()]
    width = max(len(r[1]) for r in rows)
    cat = None
    for c, name, desc in rows:
        if c != cat:
            print(f"\n[{c}]")
            cat = c
        print(f"  {name:<{width}}  {desc}")


def _cmd_render(args):
    import numpy as np

    from raytracing_tests_tpu.models import get_workload
    from raytracing_tests_tpu.utils import io
    from raytracing_tests_tpu.utils.logging import get_logger

    log = get_logger()
    w = get_workload(args.workload)
    kw = {}
    if args.width:
        kw["width"] = args.width
    if args.height:
        kw["height"] = args.height
    if args.spp:
        kw["spp"] = args.spp
    if args.bounces:
        kw["max_bounces"] = args.bounces
    if args.normals:
        kw["show_normals"] = True
    if args.bvh:
        kw["intersector"] = "bvh"
    if args.pallas:
        kw["intersector"] = "pallas"
    if args.uber:
        kw["uber"] = True
        kw["intersector"] = "pallas"
    if args.mesh:
        from raytracing_tests_tpu.parallel import make_mesh

        kw["mesh"] = make_mesh(args.mesh)
    if args.texture:
        if args.workload != "texturing-image":
            raise SystemExit(
                "--texture is only supported by the texturing-image "
                f"workload (got {args.workload!r})")
        kw["texture"] = args.texture
        kw["texture_mapping"] = args.texture_mapping
    if args.progressive:
        # Spiral refine-from-center preview (reference base2.h:329-381):
        # write the canvas after every batch of tiles so the fovea-first
        # fill-in is visible on disk as it happens.
        kw["progressive"] = True
        kw["tiles_per_step"] = args.tiles_per_step
        stem = args.out[:-4] if args.out.endswith(".png") else args.out
        state = {"k": 0}

        def on_frame(step):
            state["k"] += 1
            io.save_png(f"{stem}_p{state['k']:03d}.png", step["image"])
            log.info("progressive: %.0f%% -> %s_p%03d.png",
                     100 * step["done_fraction"], stem, state["k"])

        kw["on_frame"] = on_frame
    t0 = time.perf_counter()
    out = w.run(**kw)
    img = np.asarray(out["image"])
    dt = time.perf_counter() - t0
    log.info("%s: %s in %.2fs", w.name, img.shape, dt)
    io.save_png(args.out, img)
    log.info("wrote %s", args.out)
    if args.depth_out and "depth" in out:
        d = np.asarray(out["depth"])
        lo, hi = d.min(), min(d.max(), 100 * max(d.min(), 1e-3))
        io.save_png(args.depth_out, np.repeat(((d - lo) / max(hi - lo, 1e-9))[..., None], 3, -1))
        log.info("wrote %s", args.depth_out)


def _cmd_train(args):
    import numpy as np
    import optax

    from raytracing_tests_tpu.diff import TrainState, make_train_step, params_mask
    from raytracing_tests_tpu.models import get_workload
    from raytracing_tests_tpu.utils import io
    from raytracing_tests_tpu.utils.logging import get_logger

    log = get_logger()
    w = get_workload(args.workload)
    kw = {}
    if getattr(args, "pallas", False) or args.soft_edges > 0.0:
        # fast gradient path (diff/fastpath.py); the soft-edge estimator
        # only exists there, so --soft-edges implies it.
        kw["intersector"] = "pallas"
    out = w.run(width=args.width, height=args.height, spp=args.spp, **kw)
    scene, camera, cfg = out["scene"], out["camera"], out["cfg"]
    target = np.asarray(out["image"])

    fields = args.train_fields.split(",")
    rng = np.random.default_rng(args.seed)
    # Perturb the fields being trained so the demo recovers something real.
    perturbed = scene
    if "color" in fields:
        perturbed = perturbed.replace(
            color=scene.color * 0.5
            + rng.uniform(0, 0.5, scene.color.shape).astype("float32")
        )
    if "position" in fields:
        jitter = rng.uniform(-0.1, 0.1, scene.position.shape).astype("float32")
        perturbed = perturbed.replace(position=scene.position + jitter)
    if "scale" in fields:
        factor = rng.uniform(0.85, 1.15, (scene.capacity, 1)).astype("float32")
        perturbed = perturbed.replace(scale=scene.scale * factor)
    if perturbed is scene:  # other fields: mild color shift keeps loss nonzero
        perturbed = perturbed.replace(color=scene.color * 0.8 + 0.1)
    if args.soft_edges > 0.0:
        import dataclasses

        cfg = dataclasses.replace(cfg, soft_edges=args.soft_edges)
    opt = optax.adam(args.lr)
    mesh = None
    if args.mesh:
        from raytracing_tests_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)
    step = make_train_step(
        perturbed, camera, cfg, opt, mesh=mesh,
        grad_bands=args.grad_bands,
        auto_pops=args.auto_pops,
        trainable=params_mask(perturbed, *fields)
    )
    st = TrainState.create(perturbed, opt)
    start = 0
    if args.ckpt_dir:
        from raytracing_tests_tpu.app import checkpoint as ckpt

        restored, start = ckpt.restore_train_state(args.ckpt_dir, st)
        if restored is not None:
            st = restored
            log.info("resumed from step %d", start)
    for k in range(start, args.steps):
        st, loss = step(st, target)
        if k % max(1, args.steps // 10) == 0 or k == args.steps - 1:
            log.info("step %4d  loss %.6g", k, float(loss))
        if args.ckpt_dir and (k + 1) % args.ckpt_every == 0:
            from raytracing_tests_tpu.app import checkpoint as ckpt

            ckpt.save_train_state(args.ckpt_dir, st, k + 1)
    if args.out_dir:
        import os

        os.makedirs(args.out_dir, exist_ok=True)
        from raytracing_tests_tpu.diff import apply_params
        from raytracing_tests_tpu.ops.render import render_jit

        final = render_jit(apply_params(perturbed, st.params), camera, cfg)
        io.save_png(f"{args.out_dir}/target.png", target)
        io.save_png(f"{args.out_dir}/final.png", np.asarray(final["image"]))
        log.info("wrote %s/{target,final}.png", args.out_dir)


def _cmd_info(_args):
    """Device capability readout — the analogue of CS-00's max-workgroup
    queries shown in its ImGui panel (basic_compute_shader.cpp:122-132)."""
    import jax

    print(f"backend: {jax.default_backend()}")
    print(f"process {jax.process_index()} of {jax.process_count()}")
    for dev in jax.devices():
        print(f"  {dev.id}: {dev.device_kind} platform={dev.platform} "
              f"host={dev.process_index}")
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            gb = 1 << 30
            print(f"     hbm: {stats.get('bytes_in_use', 0)/gb:.2f} GiB in use / "
                  f"{stats.get('bytes_limit', 0)/gb:.2f} GiB")
    from raytracing_tests_tpu import native

    print(f"native host runtime: {'available' if native.available() else 'unavailable'}")


def _cmd_watch(args):
    from raytracing_tests_tpu.app.watch import watch

    run_kw = {}
    for k in ("width", "height", "spp"):
        if getattr(args, k):
            run_kw[k] = getattr(args, k)
    watch(args.workload, args.params, out=args.out,
          interval_s=args.interval, max_renders=args.max_renders,
          run_kw=run_kw)


def _cmd_bench(args):
    import os
    import runpy

    if args.smoke:
        os.environ["BENCH_SMOKE"] = "1"
    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(__file__), "../../bench.py"), run_name="__main__")


def _enable_compile_cache():
    """Persistent XLA compilation cache (same dir as bench.py): a cold
    Pallas compile through the TPU tunnel costs 50-250 s (PERFORMANCE.md
    fact 6) — without this every CLI invocation re-pays it."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_comp")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv=None):
    p = argparse.ArgumentParser(prog="raytracing_tests_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered workloads")
    sub.add_parser("info", help="device / backend capability readout")

    pr = sub.add_parser("render", help="render one workload to PNG")
    pr.add_argument("workload")
    pr.add_argument("--width", type=int)
    pr.add_argument("--height", type=int)
    pr.add_argument("--spp", type=int)
    pr.add_argument("--bounces", type=int)
    pr.add_argument("--normals", action="store_true", help="debug normals view")
    pr.add_argument("--bvh", action="store_true", help="use the LBVH intersector")
    pr.add_argument("--pallas", action="store_true", help="use the Pallas sweep kernels")
    pr.add_argument("--uber", action="store_true",
                    help="use the persistent megakernel (fastest; untextured "
                    "bvh-shading scenes)")
    pr.add_argument("--mesh", type=int, help="shard over N devices")
    pr.add_argument("--out", default="render.png")
    pr.add_argument("--depth-out", help="also write normalized depth PNG")
    pr.add_argument("--progressive", action="store_true",
                    help="spiral refine-from-center tile rendering; writes "
                    "an intermediate PNG per tile batch (reference base2)")
    pr.add_argument("--tiles-per-step", type=int, default=4,
                    help="tiles traced per progressive step")
    pr.add_argument("--texture", help="image file for texturing-image "
                    "(PNG/JPG; remapped onto the cube-sphere atlas)")
    pr.add_argument("--texture-mapping", default="mercator",
                    choices=("mercator", "cubic"),
                    help="how to interpret --texture: equirectangular "
                    "(earth.jpg) or packed 6-face atlas (dice.png)")

    pt = sub.add_parser("train", help="inverse-rendering demo: recover scene params")
    pt.add_argument("workload")
    pt.add_argument("--steps", type=int, default=100)
    pt.add_argument("--lr", type=float, default=2e-2)
    pt.add_argument("--width", type=int, default=64)
    pt.add_argument("--height", type=int, default=36)
    pt.add_argument("--spp", type=int, default=2)
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--mesh", type=int)
    pt.add_argument("--train-fields", default="color")
    pt.add_argument("--pallas", action="store_true",
                    help="fast gradient path (Pallas winner-finding + "
                    "closed-form recompute)")
    pt.add_argument(
        "--grad-bands", type=int, default=1,
        help="accumulate gradients over N image row bands (exact; 1/N the "
             "backward's peak memory — for full-resolution frames)")
    pt.add_argument(
        "--auto-pops", action="store_true",
        help="probe each band's true max ray-tree depth and cut the "
        "reverse-mode scan to it (exact; ~1.3x the step on deep-budget "
        "configs; needs --grad-bands > 1)")
    pt.add_argument(
        "--soft-edges", type=float, default=0.0,
        help="edge-aware gradient band (~0.03 recommended when training "
        "position/scale; sphere-mode scenes only — implies the Pallas "
        "fast gradient path; see diff/fastpath.py)")
    pt.add_argument("--out-dir")
    pt.add_argument("--ckpt-dir", help="checkpoint/resume directory")
    pt.add_argument("--ckpt-every", type=int, default=20)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.add_argument("--smoke", action="store_true")

    pw = sub.add_parser(
        "watch", help="live-param loop: re-render on params-file change "
        "(the reference's hot-reload/ImGui-knob loop, base.h:27-57)")
    pw.add_argument("workload")
    pw.add_argument("--params", required=True,
                    help="JSON params file to poll (see app/watch.py schema)")
    pw.add_argument("--out", default="watch.png")
    pw.add_argument("--interval", type=float, default=0.5,
                    help="poll interval seconds")
    pw.add_argument("--max-renders", type=int,
                    help="stop after N processed params-file changes "
                    "(rejected params count; default: run forever)")
    pw.add_argument("--width", type=int)
    pw.add_argument("--height", type=int)
    pw.add_argument("--spp", type=int)

    args = p.parse_args(argv)
    if args.cmd in ("render", "train", "watch", "bench"):
        _enable_compile_cache()  # list/info/--help skip the jax config
    {
        "list": _cmd_list,
        "info": _cmd_info,
        "render": _cmd_render,
        "train": _cmd_train,
        "bench": _cmd_bench,
        "watch": _cmd_watch,
    }[args.cmd](args)


if __name__ == "__main__":
    main()
