"""CLI entry point: render an .rtc scene to an image file.

Mirrors the reference launcher's surface (/root/reference/orion/
launcher.cpp:15-45): positional rtc file; -o/--output; -p pixel samples;
-l shadow-ray (light) samples. The reference's --threads flag maps to
nothing here — parallelism is the TPU chip (and --shard spreads rays
across a device mesh when more than one device is visible).

Usage:
    python -m orion_tpu.cli scene.rtc -o out.png -p 16 -l 2
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="orion_tpu",
        description="TPU-native differentiable ray tracer "
                    "(renders .rtc scene files)")
    p.add_argument("rtc_file", help="Path to an .rtc file")
    p.add_argument("--output", "-o", default="raytracer.png",
                   help="Output image (.png/.ppm/.hdr; default %(default)s)")
    p.add_argument("-p", dest="samples", type=int, default=1,
                   help="Pixel samples (default %(default)s)")
    p.add_argument("-l", dest="light_samples", type=int, default=1,
                   help="Shadow-ray samples per light (default %(default)s)")
    p.add_argument("--depth", type=int, default=None,
                   help="Max bounce depth (default: rtc recursion level)")
    p.add_argument("--mode", choices=["whitted", "path"], default=None,
                   help="Force render mode (default: auto from rtc lights)")
    p.add_argument("--backend", choices=["brute", "bvh", "fused"],
                   default=None,
                   help="Force intersection backend (default: auto by "
                        "size; 'fused' pins the VMEM megakernel and "
                        "errors when the scene is outside its gate)")
    p.add_argument("--strategy", choices=["median", "middle", "sah"],
                   default="sah", help="BVH split strategy")
    p.add_argument("--seed", type=int, default=0, help="RNG seed")
    p.add_argument("--xres", type=int, default=None,
                   help="Override rtc x resolution")
    p.add_argument("--yres", type=int, default=None,
                   help="Override rtc y resolution")
    p.add_argument("--shard", action="store_true",
                   help="Shard rays across ALL visible devices via "
                        "shard_map (scene replicated per chip; no-op "
                        "gain on one device). Composes with --regen")
    p.add_argument("--regen", action="store_true",
                   help="Use the regenerative wavefront path tracer "
                        "(orion_tpu.regen): dead rays immediately restart "
                        "as the next sample. Much faster at high depth "
                        "caps; path mode only, forward-only")
    p.add_argument("--normal-maps", action="store_true",
                   help="Enable tangent-space normal mapping (the reference "
                        "ships this disabled; PARITY.md)")
    p.add_argument("--checkpoint", default=None,
                   help="Checkpoint file for resumable accumulation "
                        "(resumes if it exists; see io/checkpoint.py)")
    p.add_argument("--checkpoint-every", type=int, default=64,
                   help="Samples per checkpoint flush (default %(default)s)")
    p.add_argument("--stats", action="store_true",
                   help="Print a JSON render report to stderr")
    # kept for launcher.cpp parity; ignored (no host threading to configure)
    p.add_argument("--threads", "-t", type=int, default=0,
                   help=argparse.SUPPRESS)
    return p


def _maybe_fused(ps, args, max_depth):
    """(renderer, backend_name) when the VMEM megakernel should carry the
    render: --backend fused pins it (error outside its gate); with no
    backend forced, supported scenes route to it automatically — the
    plain `orion_tpu scene.rtc` invocation gets the fast path the bench
    measures. Returns (None, None) to fall through to the wavefront.
    """
    want = args.backend == "fused"
    auto = args.backend is None and not args.normal_maps
    if not (want or auto):
        return None, None
    mode = args.mode or ("whitted" if ps.scene.num_lights > 0 else "path")
    if mode == "path":
        from orion_tpu.ops.pallas_fused import (fused_path_supported,
                                                make_fused_path_renderer)

        if fused_path_supported(ps.scene):
            return make_fused_path_renderer(
                ps.scene, ps.camera, samples=args.samples,
                max_depth=max_depth,
                light_samples=args.light_samples), "fused-pallas"
        from orion_tpu.engine import make_big_path_renderer

        try:
            # past the brute gate: best big-scene path megakernel
            # (sorted-wavefront bounce kernel first, resident walk as
            # fallback — engine.BIG_PATH_ORDER)
            return make_big_path_renderer(
                ps.scene, ps.camera, samples=args.samples,
                max_depth=max_depth, light_samples=args.light_samples,
                strategy=args.strategy, order_signs=ps.order_signs)
        except ValueError:
            pass  # outside every gate / over the cap: wavefront it is
    else:
        from orion_tpu.ops.pallas_whitted import (
            fused_whitted_supported, make_fused_whitted_renderer)

        if fused_whitted_supported(ps.scene):
            return make_fused_whitted_renderer(
                ps.scene, ps.camera, samples=args.samples,
                max_depth=max_depth), "fused-whitted-pallas"
        from orion_tpu.ops.pallas_bvh_whitted import (
            bvh_whitted_supported, make_bvh_whitted_renderer)

        if bvh_whitted_supported(ps.scene):
            try:
                return make_bvh_whitted_renderer(
                    ps.scene, ps.camera, samples=args.samples,
                    max_depth=max_depth, strategy=args.strategy,
                    order_signs=ps.order_signs), "bvh-whitted-pallas"
            except ValueError:
                pass  # over the residency cap: wavefront it is
        from orion_tpu.ops.pallas_bvh_whitted import (
            bvh_whitted_deferred_supported, make_bvh_whitted_deferred)

        if bvh_whitted_deferred_supported(ps.scene, max_depth):
            # textured scenes (depth <= 4): deferred-texturing megakernel
            try:
                return make_bvh_whitted_deferred(
                    ps.scene, ps.camera, samples=args.samples,
                    max_depth=max_depth, strategy=args.strategy,
                    order_signs=ps.order_signs), "bvh-whitted-deferred"
            except ValueError:
                pass  # over the residency cap: wavefront it is
    if want:
        raise SystemExit("error: --backend fused, but the scene is "
                         "outside the megakernel gate (textures / "
                         "emitters / triangle count); see "
                         "ops/pallas_fused.py FUSED_* limits")
    return None, None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from orion_tpu.engine import prepare, render_report
    from orion_tpu.io.image import save_image

    force = args.backend if args.backend in ("brute", "bvh") else None
    ps = prepare(args.rtc_file, strategy=args.strategy,
                 force_backend=force,
                 xres=args.xres, yres=args.yres)
    # the reference caps trace() at rtc.recursion_level exactly
    # (raytracer.cpp:29,203-206); nanosuit/hindu say 0 — no bounces
    max_depth = (args.depth if args.depth is not None
                 else int(ps.rtc.recursion_level))
    key = jax.random.key(args.seed)

    if args.regen:
        mode = args.mode or ("whitted" if ps.rtc.lights else "path")
        if mode != "path" or args.normal_maps:
            print("error: --regen requires path mode (no rtc point "
                  "lights / --mode path) and no --normal-maps",
                  file=sys.stderr)
            return 2

    t0 = time.perf_counter()
    if args.shard and args.checkpoint:
        from orion_tpu.io.checkpoint import render_accumulate
        from orion_tpu.parallel.sharding import make_mesh

        img = render_accumulate(ps, key, samples=args.samples,
                                light_samples=args.light_samples,
                                max_depth=max_depth, mode=args.mode,
                                path=args.checkpoint,
                                every=args.checkpoint_every,
                                regen=args.regen, mesh=make_mesh())
    elif args.shard:
        from orion_tpu.parallel.sharding import make_mesh

        mesh = make_mesh()
        if args.regen:
            from orion_tpu.regen import render_regen_shardmap

            img = np.asarray(render_regen_shardmap(
                ps.scene, ps.camera, key, mesh=mesh, samples=args.samples,
                light_samples=args.light_samples, max_depth=max_depth,
                intersect=ps.intersect))
        else:
            from orion_tpu.parallel.shardmap_render import render_shardmap

            img = np.asarray(render_shardmap(
                ps.scene, ps.camera, key, mesh=mesh, samples=args.samples,
                light_samples=args.light_samples, max_depth=max_depth,
                mode=args.mode, intersect=ps.intersect))
    elif args.checkpoint:
        from orion_tpu.io.checkpoint import render_accumulate

        img = render_accumulate(ps, key, samples=args.samples,
                                light_samples=args.light_samples,
                                max_depth=max_depth, mode=args.mode,
                                path=args.checkpoint,
                                every=args.checkpoint_every,
                                regen=args.regen)
    elif args.regen:
        from orion_tpu.regen import render_regen

        img = np.asarray(render_regen(
            ps.scene, ps.camera, key, samples=args.samples,
            light_samples=args.light_samples, max_depth=max_depth,
            intersect=ps.intersect))
    else:
        fused_fn, fused_name = _maybe_fused(ps, args, max_depth)
        if fused_name:
            ps.backend = fused_name
        if fused_fn is not None:
            img = np.asarray(fused_fn(key))
        else:
            from orion_tpu.render import render

            img = np.asarray(render(
                ps.scene, ps.camera, key, samples=args.samples,
                light_samples=args.light_samples, max_depth=max_depth,
                mode=args.mode, intersect=ps.intersect,
                normal_maps=args.normal_maps,
                shadow_intersect=ps.shadow_intersect))
    dt = time.perf_counter() - t0

    save_image(args.output, img)
    report = render_report(ps, samples=args.samples,
                           light_samples=args.light_samples,
                           max_depth=max_depth, seconds=dt)
    print(f"rendered {args.rtc_file} -> {args.output} "
          f"[{report['resolution'][0]}x{report['resolution'][1]}, "
          f"{args.samples} spp, {report['backend']}] in {dt:.2f}s "
          f"({report['primary_rays_per_s']:.0f} primary rays/s)")
    if args.stats:
        print(json.dumps(report), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
