"""Engine: scene preparation, backend selection, render orchestration, stats.

The TPU re-design of RayTracer::traceRTC (/root/reference/orion/
raytracer.cpp:19-103): parse the .rtc, load and flatten the scene, build
the acceleration structure, pick the fastest intersection backend for the
current JAX backend and scene size, render, and report statistics.

Backend selection:
  - small scenes (<= BRUTE_MAX_TRIS valid triangles): brute-force sweep —
    the Pallas streamed-chunk kernel on TPU, the jnp fallback elsewhere.
    For a 36-triangle cornell box a BVH walk costs more than testing
    everything.
  - large scenes: flattened BVH — the Pallas packet-traversal kernel on
    TPU (leaf bundles sized for VPU planes), the batched lax.while_loop
    walk elsewhere.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from orion_tpu.accel.bvh import DEFAULT_LEAF, SAH, BVH, BuildStats, build_bvh
from orion_tpu.camera import Camera, camera_from_rtc
from orion_tpu.io.rtc import RTCData
from orion_tpu.render import IntersectFn
from orion_tpu.scene import Scene, load_scene

BRUTE_MAX_TRIS = 1024
# Pallas packet-traversal tuning (nanosuit 512x512 sweeps, 2026-08)
TPU_LEAF_SIZE = 128
TPU_RAY_BLOCK = 1024


@dataclasses.dataclass
class PreparedScene:
    """A scene plus everything needed to render it fast."""

    scene: Scene
    rtc: RTCData
    camera: Camera
    intersect: IntersectFn
    backend: str                       # "brute-pallas" | "brute-jnp" | ...
    bvh: Optional[BVH] = None
    bvh_stats: Optional[BuildStats] = None
    build_seconds: float = 0.0
    # occlusion-only (any-hit) backend for Whitted shadow rays, where only
    # hit.mask is consumed; None => reuse `intersect`
    shadow_intersect: Optional[IntersectFn] = None


def select_intersect(scene: Scene, *, strategy: str = SAH,
                     force: Optional[str] = None,
                     order_signs=(1.0, 1.0, 1.0)):
    """Choose (intersect_fn, backend_name, bvh, stats) for a scene.

    force: "brute" | "bvh" overrides the size heuristic; the fully
    qualified forms "brute-jnp" | "brute-pallas" | "bvh-jnp" |
    "bvh-pallas" also pin the implementation.
    """
    on_tpu = jax.default_backend() == "tpu"
    force_impl = None
    if force and "-" in force:
        force, force_impl = force.split("-", 1)
    want_bvh = (scene.num_triangles > BRUTE_MAX_TRIS
                if force is None else force == "bvh")

    if not want_bvh:
        use_pallas = on_tpu if force_impl is None else force_impl == "pallas"
        if use_pallas:
            from orion_tpu.ops.pallas_intersect import intersect_brute_pallas

            return intersect_brute_pallas, "brute-pallas", None, None
        from orion_tpu.ops.intersect import intersect_brute

        return intersect_brute, "brute-jnp", None, None

    use_pallas = on_tpu if force_impl is None else force_impl == "pallas"
    # the Pallas kernel needs 128-wide leaf bundles; the jnp walk prefers
    # small leaves
    leaf = TPU_LEAF_SIZE if use_pallas else DEFAULT_LEAF
    bvh, stats = build_bvh(np.asarray(scene.tri_v0),
                           np.asarray(scene.tri_e1),
                           np.asarray(scene.tri_e2),
                           np.asarray(scene.tri_valid),
                           strategy=strategy, leaf_size=leaf,
                           leaf_width=leaf if use_pallas else None,
                           order_signs=order_signs)
    if use_pallas:
        from orion_tpu.ops.pallas_bvh import (RESIDENT_MAX_BUNDLED,
                                              make_bvh_intersect_pallas)

        if bvh.num_bundled <= RESIDENT_MAX_BUNDLED or not on_tpu:
            fn = make_bvh_intersect_pallas(bvh, scene,
                                           ray_block=TPU_RAY_BLOCK)
            return fn, "bvh-pallas", bvh, stats
        if force_impl == "pallas":
            # an explicit pin must not silently downgrade; match the
            # builder's own error instead of falling through to bvh-jnp
            raise ValueError(
                f"force_backend='bvh-pallas' but {bvh.num_bundled} bundled "
                f"triangles exceed the VMEM residency cap "
                f"({RESIDENT_MAX_BUNDLED})")
        # very large scenes: bundles exceed the VMEM residency cap
    from orion_tpu.ops.bvh_traverse import make_bvh_intersect

    return make_bvh_intersect(bvh), "bvh-jnp", bvh, stats


def prepare(rtc_path: str | Path, *, strategy: str = SAH,
            force_backend: Optional[str] = None,
            load_textures: bool = True,
            xres: Optional[int] = None,
            yres: Optional[int] = None) -> PreparedScene:
    """Load an .rtc scene and select the intersection backend."""
    t0 = time.perf_counter()
    scene, rtc = load_scene(rtc_path, load_textures=load_textures)
    if xres is not None:
        rtc.xres = xres
    if yres is not None:
        rtc.yres = yres
    from orion_tpu.validate import validate_rtc, validate_scene

    validate_rtc(rtc)
    validate_scene(scene)
    camera = camera_from_rtc(rtc)
    # bake near-first child order for the camera's direction octant into
    # the BVH flattening (~40% fewer leaf tests on coherent batches)
    signs = tuple(float(s) if s != 0 else 1.0
                  for s in np.sign(np.asarray(camera.front)))
    fn, backend, bvh, stats = select_intersect(scene, strategy=strategy,
                                               force=force_backend,
                                               order_signs=signs)
    shadow_fn = None
    if backend == "bvh-pallas" and scene.num_lights > 0:
        # Whitted scenes get an any-hit occlusion kernel for shadow rays;
        # rebuild both closures over ONE shared device layout (otherwise
        # each holds its own copy of the node + triangle buffers). Path
        # scenes never consume shadow_intersect (NEE needs nearest-hit
        # emitter identity) — skip the build entirely.
        from orion_tpu.ops.pallas_bvh import (_bvh_device_layout,
                                              make_bvh_intersect_pallas)

        layout = _bvh_device_layout(bvh)
        fn = make_bvh_intersect_pallas(bvh, scene, ray_block=TPU_RAY_BLOCK,
                                       layout=layout)
        shadow_fn = make_bvh_intersect_pallas(bvh, scene,
                                              ray_block=TPU_RAY_BLOCK,
                                              any_hit=True, layout=layout)
    return PreparedScene(scene=scene, rtc=rtc, camera=camera, intersect=fn,
                         backend=backend, bvh=bvh, bvh_stats=stats,
                         build_seconds=time.perf_counter() - t0,
                         shadow_intersect=shadow_fn)


def render_prepared(ps: PreparedScene, key, *, samples: int = 1,
                    light_samples: int = 1,
                    max_depth: Optional[int] = None,
                    mode: Optional[str] = None):
    """Render a PreparedScene; max_depth defaults to the rtc recursion
    level (raytracer.cpp:29 uses rtc.recursion_level as the depth cap)."""
    from orion_tpu.render import render

    if max_depth is None:
        max_depth = max(int(ps.rtc.recursion_level), 1)
    return render(ps.scene, ps.camera, key, samples=samples,
                  max_depth=max_depth, light_samples=light_samples,
                  mode=mode, intersect=ps.intersect,
                  shadow_intersect=ps.shadow_intersect)


def render_report(ps: PreparedScene, *, samples: int, light_samples: int,
                  max_depth: int, seconds: float) -> dict:
    """Structured per-render statistics (SURVEY.md §5 observability row;
    the reference only prints a triangle count, raytracer.cpp:305-310)."""
    H, W = ps.rtc.yres, ps.rtc.xres
    primary = H * W * samples
    shadow_per_hit = (ps.scene.num_lights if ps.scene.num_lights > 0
                      else ps.scene.num_emissive * light_samples)
    return {
        "resolution": [W, H],
        "samples": samples,
        "light_samples": light_samples,
        "max_depth": max_depth,
        "triangles": ps.scene.num_triangles,
        "meshes": ps.scene.num_meshes,
        "backend": ps.backend,
        "jax_backend": jax.default_backend(),
        "bvh_nodes": ps.bvh_stats.nodes if ps.bvh_stats else 0,
        "scene_build_seconds": round(ps.build_seconds, 3),
        "render_seconds": round(seconds, 3),
        "primary_rays": primary,
        "primary_rays_per_s": round(primary / max(seconds, 1e-9), 1),
        "est_shadow_rays_per_primary_bounce": shadow_per_hit,
    }
